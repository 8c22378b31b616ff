"""SparseMat baseline (CVPR22; reference ``maggie/network/arch/sparse_mat.py``).

Pipeline: low-res LPN pass at 0.5x (``gen_lr_batch``, ``:81-87``) -> dilated
uncertainty mask (MaxPool2d k=15 s=1, ``:50-51,76-79``) -> sparse SHM refinement over
the active pixels -> masked combine. Video inference reuses the previous frame's
prediction where the inter-frame diff is small (``generate_sparsity_map``,
``:240-255``; streaming fusion ``forward_inference``, ``:89-120``).

Dense-masked TPU form: the pixel gather becomes the active mask m1 threading through
the masked SHM; the reference's 1.6M-pixel training cap (``:67-69``) is a CUDA
memory guard with no dense equivalent and is intentionally dropped.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .losses import gradient_loss, lap_loss
from .lpn import LPN
from .shm import SHM
from ..ops.resize import resize_bilinear


def _maxpool_same(x_nchw: jax.Array, k: int) -> jax.Array:
    """MaxPool2d(k, stride=1, padding=k//2) on (..., H, W) maps."""
    lead = x_nchw.shape[:-2]
    y = x_nchw.reshape((-1,) + x_nchw.shape[-2:])[..., None]
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1), window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)])
    return y[..., 0].reshape(lead + y.shape[1:3])


def _reshape5d(maps: jax.Array, scale: float, multiple: int = 64) -> jax.Array:
    """Reference ``reshape5D`` (:18-27): bilinear resize by scale then pad x64."""
    h, w = maps.shape[-2:]
    nh, nw = int(h * scale), int(w * scale)
    y = resize_bilinear(maps.astype(jnp.float32), (nh, nw), align_corners=False)
    ph = (multiple - nh % multiple) % multiple
    pw = (multiple - nw % multiple) % multiple
    pad = [(0, 0)] * (y.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(y, pad)


class SparseMat(nn.Module):
    cfg: Any

    def setup(self):
        mc = self.cfg
        self.lpn = LPN(mid_chn=int(mc["encoder_args"].get("mid_chn", 32)), name="lpn_mod")
        self.shm = SHM(inc=4, name="shm_mod")
        self.lr_scale = mc["shm"]["lr_scale"]
        self.stride = int(mc["shm"]["dilation_kernel"])
        self.loss_alpha_w = mc["loss_alpha_w"]
        self.loss_alpha_lap_w = mc["loss_alpha_lap_w"]
        self.loss_alpha_grad_w = mc["loss_alpha_grad_w"]

    def dilate(self, alpha: jax.Array) -> jax.Array:
        m = jnp.logical_and(alpha > 0.01, alpha < 0.99).astype(jnp.float32)
        return _maxpool_same(m, self.stride)

    def generate_sparsity_map(self, lr_pred, curr_img, last_img):
        """Reference ``:240-255``. lr_pred (N,1,H,W); imgs (N,H,W,3) NHWC."""
        mask_s = self.dilate(lr_pred)
        diff = jnp.mean(jnp.abs(curr_img - last_img), axis=-1)[:, None]  # (N,1,H,W)
        box9 = jax.lax.reduce_window(
            diff[..., None].reshape(-1, *diff.shape[-2:], 1), 0.0, jax.lax.add,
            (1, 9, 9, 1), (1, 1, 1, 1), [(0, 0), (4, 4), (4, 4), (0, 0)])
        box9 = box9[..., 0].reshape(diff.shape)
        shared = jnp.logical_and(box9 < 0.05, diff < 0.001).astype(jnp.float32)
        mask_t = _maxpool_same(1 - shared, self.stride)
        mask = _maxpool_same(mask_s * mask_t, self.stride)
        return mask, mask_s, mask_t, shared

    def _run_shm(self, img_nhwc, lr_pred, mask, ctx, train):
        """Dense-masked ``generate_sparse_inputs`` + SHM (:60-74, shm.py:151-166)."""
        norm_pred = (lr_pred - 0.5) / 0.5  # (N,1,H,W)
        x = jnp.concatenate([img_nhwc, jnp.transpose(norm_pred, (0, 2, 3, 1))], axis=-1)
        m1 = jnp.transpose(mask, (0, 2, 3, 1))  # (N,H,W,1)
        preds = self.shm(x * m1, jnp.transpose(lr_pred, (0, 2, 3, 1)), m1, ctx, train)
        # back to map layout (N,1,H,W)
        return [jnp.transpose(p, (0, 3, 1, 2)) for p in preds]

    def __call__(self, batch: dict, train: bool = False, **kwargs):
        image = batch["image"]                     # (b, n_f, H, W, 3)
        masks = batch["mask"]                      # (b, n_f, n_i=1, hm, wm)
        b, n_f, h, w, _ = image.shape

        img_maps = jnp.transpose(image, (0, 1, 4, 2, 3))  # (b, n_f, 3, H, W)
        lr_img = _reshape5d(img_maps, self.lr_scale)
        mask_scale = self.lr_scale / (masks.shape[-1] / w)
        lr_mask = _reshape5d(masks, mask_scale)

        xlr = jnp.concatenate([lr_img, lr_mask], axis=2).reshape(
            b * n_f, -1, lr_img.shape[-2], lr_img.shape[-1])
        xlr = jnp.transpose(xlr, (0, 2, 3, 1))  # NHWC
        lr_pred, ctx = self.lpn(xlr, train)     # (N, h', w', 1), (N, h16, w16, 32)
        lr_pred = jnp.transpose(lr_pred, (0, 3, 1, 2))  # (N,1,h',w')

        xhr = image.reshape(b * n_f, h, w, 3)
        lr_pred = resize_bilinear(lr_pred, (lr_pred.shape[-2] * 2, lr_pred.shape[-1] * 2),
                                  align_corners=False)
        lr_pred = lr_pred[:, :, :h, :w]

        if not train:
            return self._forward_inference(lr_pred, xhr, ctx, b, n_f)

        mask = self.dilate(lr_pred)
        pred_list = self._run_shm(xhr, lr_pred, mask, ctx, train)
        final = pred_list[-1].reshape(b, n_f, -1, h, w)
        mask5 = mask.reshape(b, n_f, -1, h, w)
        lr5 = lr_pred.reshape(b, n_f, -1, h, w)
        final = final * mask5 + lr5 * (1 - mask5)
        output = {"refined_masks": final}
        loss_dict = self.compute_loss(pred_list, lr_pred, batch["alpha"], mask)
        return output, loss_dict

    def _forward_inference(self, lr_pred, x_hr, ctx, b, n_f):
        """Streaming fusion (:89-120). Python loop over the (static) clip length."""
        N = lr_pred.shape[0]
        if N > 1:
            mask_rest, _, _, shared = self.generate_sparsity_map(
                lr_pred[1:], x_hr[1:], x_hr[:-1])
            pre_mask = self.dilate(lr_pred[:1])
            mask = jnp.concatenate([pre_mask, mask_rest], axis=0)
        else:
            mask = self.dilate(lr_pred)
            shared = jnp.zeros_like(mask[:0])

        preds = self._run_shm(x_hr, lr_pred, mask, ctx, False)[-1]

        last = None
        outs = []
        for i in range(N):
            if last is None:
                last = preds[i:i + 1] * mask[i:i + 1] + lr_pred[i:i + 1] * (1 - mask[i:i + 1])
            else:
                s = shared[i - 1:i]
                last = (preds[i:i + 1] * mask[i:i + 1]
                        + lr_pred[i:i + 1] * (1 - mask[i:i + 1]) * (1 - s)
                        + last * (1 - mask[i:i + 1]) * s)
            outs.append(last)
        all_preds = jnp.concatenate(outs, axis=0)
        return {"refined_masks": all_preds.reshape(b, n_f, -1, *all_preds.shape[-2:])}

    def compute_loss(self, pred_list, lr_pred, alphas, mask):
        """Reference ``compute_loss`` (:186-238): multi-scale heads, weights 2,1,.5,.25
        over [p0, p1, p2, p4], each masked-combined with lr_pred first."""
        h, w = alphas.shape[-2:]
        a = alphas.reshape(-1, 1, h, w)
        m = mask.reshape(-1, 1, h, w)
        lr = lr_pred.reshape(-1, 1, h, w)
        combined = []
        for p in pred_list:
            if p.shape[-1] != w:
                p = resize_bilinear(p, (h, w), align_corners=False)
            combined.append(p * m + lr * (1 - m))

        loss_dict = {}
        total = 0.0
        if self.loss_alpha_w > 0:
            rec, weight = 0.0, 2.0
            for p in combined[::-1]:
                rec += weight * jnp.mean(jnp.abs(p - a))
                weight /= 2.0
            loss_dict["loss_rec"] = rec
            total += rec * self.loss_alpha_w
        if self.loss_alpha_lap_w > 0:
            lap, weight = 0.0, 2.0
            for p in combined[::-1]:
                lap += weight * lap_loss(p, a)
                weight /= 2.0
            loss_dict["loss_lap"] = lap
            total += lap * self.loss_alpha_lap_w
        if self.loss_alpha_grad_w > 0:
            g, weight = 0.0, 2.0
            for p in combined[::-1]:
                g += weight * gradient_loss(p, a)
                weight /= 2.0
            loss_dict["loss_grad"] = g
            total += g * self.loss_alpha_grad_w
        loss_dict["total"] = total
        return loss_dict


class SparseMatSingInst(SparseMat):
    """Inference-time per-instance loop (reference ``SparseMat_SingInst``, :257-272)."""

    def __call__(self, batch: dict, train: bool = False, **kwargs):
        if train:
            return super().__call__(batch, train=True, **kwargs)
        masks = batch["mask"]
        n_i = masks.shape[2]
        outs = []
        for i in range(n_i):
            sub = dict(batch)
            sub["mask"] = masks[:, :, i:i + 1]
            outs.append(super().__call__(sub, train=False, **kwargs))
        return {k: jnp.concatenate([o[k] for o in outs], axis=2) for k in outs[0]}

"""TCVOM baseline video arch (reference ``maggie/network/arch/tcvom.py``):
MGM + temporal Feature Aggregation Module — a first pass over all frames, then a
per-middle-frame second pass attending to neighbor features (``:18-91``), with a
window-9 unfold attention GT loss (``compute_atten_loss``, ``:93-129``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .fam import unfold_nhwc
from .maggie import MaGGIe
from ..ops.resize import avg_pool2d, resize_nearest


def _maxpool_same_map(x: jax.Array, k: int = 15) -> jax.Array:
    lead = x.shape[:-2]
    y = x.reshape((-1,) + x.shape[-2:])[..., None]
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)])
    return y[..., 0].reshape(lead + y.shape[1:3])


class TCVOM(MaGGIe):

    def dilate(self, alpha: jax.Array) -> jax.Array:
        m = jnp.logical_and(alpha > 0.01, alpha < 0.99).astype(jnp.float32)
        return _maxpool_same_map(m, 15)

    def __call__(self, batch, train: bool = False, update_sn: bool = False,
                 use_prm_weights: bool = True, **kwargs):
        x = batch["image"]
        masks = batch["mask"]
        alphas = batch.get("alpha")
        trans_gt = batch.get("transition")
        b, n_f, h, w, _ = x.shape
        n_i = masks.shape[2]

        x = x.reshape(b * n_f, h, w, 3)
        if masks.shape[-1] != w:
            masks = resize_nearest(masks.reshape(b * n_f, n_i, *masks.shape[-2:]), (h, w))
        else:
            masks = masks.reshape(b * n_f, n_i, h, w)
        masks = masks.astype(x.dtype)

        if self.num_masks > 0:
            inp_masks = masks
            if self.num_masks - n_i > 0:
                pad = jnp.zeros((b * n_f, self.num_masks - n_i, h, w), x.dtype)
                inp_masks = jnp.concatenate([masks, pad], axis=1)
                if train:
                    masks = inp_masks
                    if alphas is not None:
                        zpad = jnp.zeros((b, n_f, self.num_masks - n_i, h, w), x.dtype)
                        alphas = jnp.concatenate([alphas, zpad], axis=2)
                        trans_gt = jnp.concatenate([trans_gt, zpad], axis=2)
                    n_i = self.num_masks
            inp = jnp.concatenate([x, jnp.transpose(inp_masks, (0, 2, 3, 1))], axis=-1)
        else:
            inp = x

        embedding, mid_fea = self.encoder(inp, train=train, update_sn=update_sn)
        embedding = self.aspp(embedding, train=train)
        shortcuts = mid_fea["shortcut"]

        # 1st pass: all frames, no FAM (:26)
        raw_preds, features, _, _, _ = self.decoder(embedding, shortcuts,
                                                    train=train, update_sn=update_sn)

        feats5 = features.reshape(b, n_f, *features.shape[1:])
        emb5 = embedding.reshape(b, n_f, *embedding.shape[1:])
        sc5 = [f.reshape(b, n_f, *f.shape[1:]) for f in shortcuts]

        unknown = self.dilate(raw_preds["alpha_os1"])
        unknown = unknown.reshape(b, n_f, -1, h, w).max(axis=2, keepdims=True)

        preds = {k: [v.reshape(b, n_f, *v.shape[1:])[:, 0]] for k, v in raw_preds.items()}
        attb = [None] * n_f
        attf = [None] * n_f
        small_mask = [None] * n_f

        for i in range(1, n_f - 1):
            cur_sc = [f[:, i] for f in sc5]
            pred, _, attb[i], attf[i], small_mask[i] = self.decoder(
                emb5[:, i], cur_sc, xb=feats5[:, i - 1], xf=feats5[:, i + 1],
                mask=unknown[:, i], train=train, update_sn=update_sn)
            for k, v in pred.items():
                preds[k].append(v)

        for k, v in raw_preds.items():
            preds[k].append(v.reshape(b, n_f, *v.shape[1:])[:, -1])
            preds[k] = jnp.stack(preds[k], axis=1).reshape(-1, self.num_masks, h, w)

        rng4 = self.make_rng("unknown") if train else None
        rng1 = self.make_rng("unknown") if train else None
        alpha_pred, weight_os4, weight_os1 = self.fuse(preds, train, rng4, rng1)

        output = self._transform_output(b, n_f, h, w, n_i, preds, alpha_pred, train)

        if train:
            alphas_flat = alphas.reshape(-1, n_i, h, w)
            trans_flat = trans_gt.reshape(-1, n_i, h, w)
            loss_dict = self.compute_loss(preds, weight_os4, weight_os1,
                                          alphas_flat, trans_flat, (b, n_f, n_i, h, w))
            if self.loss_atten_w > 0:
                amax = alphas.reshape(b, n_f, -1, h, w).max(axis=2, keepdims=True)
                attn_loss = self.compute_atten_loss(amax, attb, attf, small_mask)
                loss_dict["loss_atten"] = attn_loss
                loss_dict["total"] = loss_dict["total"] + attn_loss * self.loss_atten_w
            return output, loss_dict

        for k, v in output.items():
            output[k] = v[:, :, :n_i]
        return output

    def compute_loss(self, pred, weight_os4, weight_os1, alphas, trans_gt, alpha_shape,
                     reweight_os8=None):
        # TCVOM computes its loss with reweight_os8 disabled (:73)
        return super().compute_loss(pred, weight_os4, weight_os1, alphas, trans_gt,
                                    alpha_shape, reweight_os8=False)

    def compute_atten_loss(self, alphas, attb, attf, small_mask):
        """Window-9 attention GT BCE (reference ``:93-129``), branchless over the
        mask-empty case."""
        os = 8
        bs, n_f, _, H, W = alphas.shape
        h, w = H // os, W // os
        losses = []
        for c in range(1, n_f - 1):
            bgt = avg_pool2d(alphas[:, c - 1], os)  # (bs, 1, h, w)
            fgt = avg_pool2d(alphas[:, c + 1], os)
            cgt = avg_pool2d(alphas[:, c], os)
            m = small_mask[c].reshape(bs, h * w)  # (bs, hw), 0/1
            cnt = jnp.sum(m)

            def unfold_gt(g):
                g_nhwc = jnp.transpose(g, (0, 2, 3, 1))
                u = unfold_nhwc(g_nhwc, 9)[..., 0]  # (bs, h, w, 81)
                return jnp.transpose(u.reshape(bs, h * w, 81), (0, 2, 1))  # (bs, 81, hw)

            bgt_u = jax.lax.stop_gradient(unfold_gt(bgt))
            fgt_u = jax.lax.stop_gradient(unfold_gt(fgt))
            cg = jax.lax.stop_gradient(cgt.reshape(bs, 1, h * w))
            dcb = (jnp.abs(cg - bgt_u) < 0.3).astype(jnp.float32) * 0.8
            dcf = (jnp.abs(cg - fgt_u) < 0.3).astype(jnp.float32) * 0.8

            def masked_bce(logits, labels):
                per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                per = per * m[:, None, :]
                return jnp.sum(per) / jnp.maximum(cnt * per.shape[1], 1.0)

            loss = (masked_bce(attb[c], dcb) + masked_bce(attf[c], dcf)) / 2.0
            losses.append(jnp.where(cnt > 0, loss, 0.0))
        return sum(losses) / float(len(losses))


class TCVOMSingInst(TCVOM):
    def __call__(self, batch, train: bool = False, **kwargs):
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

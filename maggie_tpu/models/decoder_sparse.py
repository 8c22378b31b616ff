"""MaGGIe detail decoder: instance-query attention at os8 + sparse refinement ladder.

Rebuilds reference ``maggie/network/decoder/resnet_inst_matt_spconv.py`` (the
production MaGGIe decoder) with TPU-native machinery:

- ``os32 -> os8`` dense upsampling blocks + skips (``:368-388``);
- ``refine_OS8`` instance-query attention (``InstanceMatteDecoder``);
- uncertainty region from the os8 prediction via on-device ``compute_unknown``
  (k=30; the reference pays a host round-trip here, ``:318``);
- a sparse refinement ladder os8 -> os4 -> os2 -> os1 over the uncertainty region
  only, with per-pixel instance-specific features (queries gating os8 features,
  ``:227-232``), inverse-conv upsampling that reuses the forward index book
  (``indice_key`` pairing, ``:61-116``), dense skip-feature injection at each rung
  (``combine_dense_sparse_feat``, ``:161-170``) and a sigmoid instance gate
  (``instance_spec_guidance``, ``:172-194``);
- sparse heads densified with the -99 sentinel so inactive sites decode to alpha 0
  after ``(tanh+1)/2`` (``:248-251,265-268``);
- PRM fusion restricted to the detail mask (``fuse``, ``:272-290``).

Here the sparse ladder runs in its dense-masked oracle form (see
``models/sparse_layers.py``); the fixed-capacity block-sparse Pallas path plugs in
behind the same interface.

Data-dependent reference branches are made jit-safe:
- the training patch-guard ``unknown_os8.max()==0`` (``:347-348``) becomes a
  branchless where();
- the eval early-out ``unknown_os8.sum()>0`` (``:350-365``) is dropped — with an
  empty active set every sparse site densifies to the -99 sentinel, so alphas are 0
  exactly as the reference's zero tensors;
- the warmup gate ``is_use_alphas_gt`` (``:312-316``) takes its iter/random part as
  a static host flag and keeps the data-dependent ``x_os8.sum()==0`` rescue as a
  traced select.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .attention import FFNLayer
from .instance_decoder import InstanceMatteDecoder
from .layers import ResLayerDec
from .sparse_layers import MaskedBatchNorm, SparseInverseConv, SubMConv, active_pyramid
from ..ops.morphology import compute_unknown
from ..ops.resize import resize_bilinear


class ResShortCutInstMattSpconvDec(nn.Module):
    layers: tuple[int, ...] = (2, 3, 3, 2)
    atten_stride: float = 1.0
    atten_dim: int = 128
    atten_block: int = 2
    atten_head: int = 1
    final_channel: int = 64
    max_inst: int = 10
    use_id_pe: bool = True
    warmup_mask_atten_iter: int = 4000
    warmup_detail_iter: int = 3000
    detail_mask_dropout: float = 0.2
    large_kernel: bool = False

    def setup(self):
        k = 5 if self.large_kernel else 3
        self._head_k = k
        self.layer1 = ResLayerDec(256, self.layers[0], 2, name="layer1")
        self.layer2 = ResLayerDec(128, self.layers[1], 2, name="layer2")
        self.refine_OS8 = InstanceMatteDecoder(
            input_dim=128,
            atten_stride=self.atten_stride,
            attention_dim=self.atten_dim,
            n_block=self.atten_block,
            n_head=self.atten_head,
            output_dim=self.final_channel,
            max_inst=self.max_inst,
            return_feat=True,
            use_temp_pe=False,
            use_id_pe=self.use_id_pe,
            name="refine_OS8_mod",
        )
        self.inst_spec_layer = FFNLayer(self.final_channel, self.final_channel,
                                        dropout=0.1, name="inst_spec_layer")
        # os8 -> os4 ladder (reference layer3/guidance/smooth, :69-116)
        self.l3_inv = SparseInverseConv(64, name="layer3_inv")
        self.l3_bn = MaskedBatchNorm(name="layer3_bn")
        self.l3_subm = SubMConv(64, 3, name="layer3_subm")
        self.guide_conv1 = SubMConv(64, 1, name="guidance_conv1")
        self.guide_bn = MaskedBatchNorm(name="guidance_bn")
        self.guide_conv2 = SubMConv(64, 3, use_bias=True, name="guidance_conv2")
        self.l3s_conv = SubMConv(64, 1, use_bias=True, name="layer3_smooth_conv")
        self.l3s_bn = MaskedBatchNorm(name="layer3_smooth_bn")
        # os4 -> os2
        self.l4_inv = SparseInverseConv(32, name="layer4_inv")
        self.l4_bn = MaskedBatchNorm(name="layer4_bn")
        self.l4_subm = SubMConv(32, 1, name="layer4_subm")
        self.l4s_conv = SubMConv(32, 1, use_bias=True, name="layer4_smooth_conv")
        self.l4s_bn = MaskedBatchNorm(name="layer4_smooth_bn")
        # os2 -> os1
        self.l5_inv = SparseInverseConv(32, name="layer5_inv")
        self.l5_bn = MaskedBatchNorm(name="layer5_bn")
        self.l5_subm = SubMConv(32, 3, name="layer5_subm")
        self.l5s_conv = SubMConv(32, 1, use_bias=True, name="layer5_smooth_conv")
        self.l5s_bn = MaskedBatchNorm(name="layer5_smooth_bn")
        # heads
        self.os4_conv1 = SubMConv(32, self._head_k, name="refine_OS4_conv1")
        self.os4_bn = MaskedBatchNorm(name="refine_OS4_bn")
        self.os4_conv2 = SubMConv(1, self._head_k, use_bias=True, name="refine_OS4_conv2")
        self.os1_conv1 = SubMConv(32, self._head_k, name="refine_OS1_conv1")
        self.os1_bn = MaskedBatchNorm(name="refine_OS1_bn")
        self.os1_conv2 = SubMConv(1, self._head_k, use_bias=True, name="refine_OS1_conv2")

    def predict_details(self, os8_feat, roi_masks, queries, fea1, fea2, fea3, train):
        """Sparse ladder in dense-masked form. Shapes:
        os8_feat (B, h8, w8, C); roi_masks (B, n_i, H, W); queries (B, n_i, C);
        fea1 (B, H, W, 32); fea2 (B, H/2, W/2, 32); fea3 (B, H/4, W/4, 64).
        Returns logits x_os4 (B, n_i, H/4, W/4), x_os1 (B, n_i, H, W) with -99 sentinel.
        """
        B, n_i, H, W = roi_masks.shape
        lr = lambda z: nn.leaky_relu(z, 0.2)

        m1 = roi_masks.reshape(B * n_i, H, W, 1).astype(jnp.float32)
        m1, m2, m4, m8 = active_pyramid(m1)

        # instance-specific os8 features: broadcast per instance, gate by query
        x = jnp.broadcast_to(os8_feat[:, None], (B, n_i) + os8_feat.shape[1:])
        x = x.reshape(B * n_i, *os8_feat.shape[1:])
        g = queries.reshape(B * n_i, 1, 1, queries.shape[-1])
        x = self.inst_spec_layer(x * g, deterministic=not train) * m8

        # os8 -> os4
        x = self.l3_inv(x, m8, m4)
        x = lr(self.l3_bn(x, m4, train))
        x = self.l3_subm(x, m4)

        # instance guidance gating with the dense os4 detail features (:172-194)
        detail = jnp.broadcast_to(fea3[:, None], (B, n_i) + fea3.shape[1:]).reshape(B * n_i, *fea3.shape[1:]) * m4
        cat = jnp.concatenate([detail, x], axis=-1)
        gate = self.guide_conv1(cat, m4)
        gate = lr(self.guide_bn(gate, m4, train))
        gate = nn.sigmoid(self.guide_conv2(gate, m4))
        x = detail * gate * m4
        x = self.l3s_bn(nn.relu(self.l3s_conv(x, m4)), m4, train)

        # os4 head (-99 sentinel densification, :248-251)
        h4 = self.os4_conv1(x, m4)
        h4 = lr(self.os4_bn(h4, m4, train))
        h4 = self.os4_conv2(h4, m4)
        x_os4 = h4 * m4 + (-99.0) * (1.0 - m4)

        # os4 -> os2
        x = self.l4_inv(x, m4, m2)
        x = lr(self.l4_bn(x, m2, train))
        x = self.l4_subm(x, m2)
        d2 = jnp.broadcast_to(fea2[:, None], (B, n_i) + fea2.shape[1:]).reshape(B * n_i, *fea2.shape[1:]) * m2
        x = jnp.concatenate([d2, x], axis=-1)
        x = self.l4s_bn(nn.relu(self.l4s_conv(x, m2)), m2, train)

        # os2 -> os1
        x = self.l5_inv(x, m2, m1)
        x = lr(self.l5_bn(x, m1, train))
        x = self.l5_subm(x, m1)
        d1 = jnp.broadcast_to(fea1[:, None], (B, n_i) + fea1.shape[1:]).reshape(B * n_i, *fea1.shape[1:]) * m1
        x = jnp.concatenate([d1, x], axis=-1)
        x = self.l5s_bn(nn.relu(self.l5s_conv(x, m1)), m1, train)

        h1 = self.os1_conv1(x, m1)
        h1 = lr(self.os1_bn(h1, m1, train))
        h1 = self.os1_conv2(h1, m1)
        x_os1 = h1 * m1 + (-99.0) * (1.0 - m1)

        return (x_os4.reshape(B, n_i, H // 4, W // 4),
                x_os1.reshape(B, n_i, H, W))

    def fuse(self, alpha_os1, alpha_os4, alpha_os8, detail_mask, train, rng4=None, rng1=None):
        """PRM restricted to the detail mask (reference ``fuse``, :272-290)."""
        alpha = alpha_os8
        w4 = compute_unknown(alpha, k_size=27, is_train=train, rng=rng4) * detail_mask
        w4 = (w4 > 0).astype(alpha.dtype)
        alpha = alpha_os4 * w4 + alpha * (1 - w4)
        w1 = compute_unknown(alpha, k_size=15, is_train=train, rng=rng1) * detail_mask
        w1 = (w1 > 0).astype(alpha.dtype)
        alpha = alpha_os1 * w1 + alpha * (1 - w1)
        return alpha, w4, w1

    def __call__(
        self,
        x: jax.Array,                    # (b*n_f, h32, w32, 512) NHWC embedding
        mid_fea: dict,
        b: int,
        n_f: int,
        n_i: int,
        masks: jax.Array,                # (b*n_f, n_i_in, H, W) guidance masks
        gt_alphas: Optional[jax.Array] = None,   # (b*n_f, n_i, H, W)
        use_mask_atten: bool = False,
        use_gt_guidance: bool = False,
        train: bool = False,
        update_sn: bool = False,
        **kwargs,
    ) -> dict:
        fea1, fea2, fea3, fea4, fea5 = mid_fea["shortcut"]
        image = mid_fea["image"]
        h, w = image.shape[1], image.shape[2]

        masks5 = masks.reshape(b, n_f, masks.shape[1], masks.shape[2], masks.shape[3])
        valid_masks = (jnp.sum(masks, axis=(2, 3), keepdims=True) > 0).astype(jnp.float32)

        gt_masks = None
        if train and gt_alphas is not None:
            gt_masks = (gt_alphas > 0).reshape(b, n_f, gt_alphas.shape[1], h, w)
            if gt_masks.shape[-1] != masks5.shape[-1]:
                from ..ops.resize import resize_any_shape
                gt_masks = resize_any_shape(
                    gt_masks.astype(jnp.float32),
                    scale_factor=masks5.shape[-1] * 1.0 / gt_masks.shape[-1],
                    use_max_pool=True)

        # os32 -> os8 with skips (:368-388)
        z = self.layer1(x, train, update_sn) + fea5
        z = self.layer2(z, train, update_sn) + fea4

        x_os8_logit, feat8, queries, loss_max_atten, _ = self.refine_OS8(
            z, masks5, use_mask_atten=use_mask_atten, gt_mask=gt_masks, train=train)
        x_os8 = resize_bilinear(x_os8_logit, (h, w), align_corners=False)
        x_os8 = (jnp.tanh(x_os8) + 1.0) / 2.0

        if train:
            x_os8 = x_os8 * valid_masks
        else:
            x_os8 = x_os8[:, :n_i]

        # warmup: guide the detail branch with GT alphas (:312-316); keep the
        # data-dependent all-zero rescue as a traced select
        if train and gt_alphas is not None:
            gate = jnp.logical_or(use_gt_guidance, jnp.sum(x_os8) == 0)
            guided_mask_os8 = jnp.where(gate, gt_alphas, x_os8)
            is_use_alphas_gt = gate
        else:
            guided_mask_os8 = x_os8
            is_use_alphas_gt = None

        rng = self.make_rng("unknown") if train else None
        rngs = jax.random.split(rng, 5) if train else [None] * 5
        unknown_os8 = compute_unknown(guided_mask_os8, k_size=30, is_train=False)
        if train:
            # patch-guard for an empty region (:347-348), branchless
            empty = jnp.max(unknown_os8) == 0
            patch = jnp.zeros_like(unknown_os8)
            patch = patch.at[:, :, 200:250, 200:250].set(1.0)
            unknown_os8 = jnp.where(empty, patch, unknown_os8)

        # expand queries over frames (:351-352)
        q = jnp.broadcast_to(queries[:, None], (b, n_f) + queries.shape[1:])
        q = q.reshape(b * n_f, *queries.shape[1:])[:, :x_os8.shape[1]]

        x_os4_log, x_os1_log = self.predict_details(
            feat8, unknown_os8, q, fea1, fea2, fea3, train)
        x_os4 = resize_bilinear(x_os4_log, (h, w), align_corners=False)
        x_os4 = (jnp.tanh(x_os4) + 1.0) / 2.0
        x_os1 = (jnp.tanh(x_os1_log) + 1.0) / 2.0

        ret = {"alpha_os1": x_os1, "alpha_os4": x_os4, "alpha_os8": x_os8}

        alpha_pred, weight_os4, weight_os1 = self.fuse(
            x_os1, x_os4, x_os8, unknown_os8, train, rngs[0], rngs[1])
        ret["refined_masks"] = alpha_pred

        if train and gt_alphas is not None:
            w4_gt = compute_unknown(gt_alphas, k_size=30, is_train=True, rng=rngs[2]) * unknown_os8
            w1_gt = compute_unknown(gt_alphas, k_size=15, is_train=True, rng=rngs[3]) * unknown_os8
            weight_os4 = jnp.where(is_use_alphas_gt, w4_gt, weight_os4)
            weight_os1 = jnp.where(is_use_alphas_gt, w1_gt, weight_os1)

        ret["weight_os4"] = weight_os4
        ret["weight_os1"] = weight_os1
        ret["detail_mask"] = unknown_os8
        ret["loss_max_atten"] = loss_max_atten
        return ret


def res_shortcut_inst_matt_spconv_22(**kwargs) -> ResShortCutInstMattSpconvDec:
    """Reference factory ``res_shortcut_inst_matt_spconv_22`` (:390-391)."""
    known = {f.name for f in ResShortCutInstMattSpconvDec.__dataclass_fields__.values()}
    return ResShortCutInstMattSpconvDec(
        layers=(2, 3, 3, 2),
        **{k: v for k, v in kwargs.items() if k in known and k != "layers"})

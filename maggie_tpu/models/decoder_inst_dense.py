"""Dense InstMatt ablation decoder (reference ``decoder/resnet_inst_matt.py``,
``res_shortcut_inst_matt_22``): InstanceMatteDecoder at os8 + dense conv heads with
``max_inst`` output channels at os4/os1 (no sparse ladder), PRM fuse on a detached
os8 (``:116-131``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .decoder_dense import RefineHead
from .instance_decoder import InstanceMatteDecoder
from .layers import BatchNorm, ResLayerDec, SNConvTranspose
from ..ops.morphology import compute_unknown
from ..ops.resize import resize_bilinear


class ResShortCutInstMattDec(nn.Module):
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
    large_kernel: bool = False
    late_downsample: bool = False

    @nn.compact
    def __call__(self, x, mid_fea, b, n_f, n_i, masks,
                 gt_alphas: Optional[jax.Array] = None,
                 use_mask_atten: bool = False, train: bool = False,
                 update_sn: bool = False, **kwargs) -> dict:
        k = 5 if self.large_kernel else 3
        midplanes = 64 if self.late_downsample else 32
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

        z = ResLayerDec(256, self.layers[0], 2, name="layer1")(x, train, update_sn) + fea5
        z = ResLayerDec(128, self.layers[1], 2, name="layer2")(z, train, update_sn) + fea4

        x_os8_logit, feat8, _, loss_max_atten, _ = InstanceMatteDecoder(
            input_dim=128, atten_stride=self.atten_stride, attention_dim=self.atten_dim,
            n_block=self.atten_block, n_head=self.atten_head,
            output_dim=self.final_channel, max_inst=self.max_inst, return_feat=True,
            use_temp_pe=False, use_id_pe=self.use_id_pe, name="refine_OS8_mod")(
            z, masks5, use_mask_atten=use_mask_atten, gt_mask=gt_masks, train=train)
        if not train:
            # exact: per-channel ops commute with the slot slice (see decoder_sparse)
            x_os8_logit = x_os8_logit[:, :n_i]
        x_os8 = resize_bilinear(x_os8_logit, (h, w), align_corners=False)
        x_os8 = (jnp.tanh(x_os8) + 1.0) / 2.0
        if train:
            x_os8 = x_os8 * valid_masks

        unknown_os8 = compute_unknown(x_os8, k_size=30, is_train=False)

        z = ResLayerDec(64, self.layers[2], 2, name="layer3")(feat8, train, update_sn) + fea3
        x_os4 = RefineHead(32, self.max_inst, k, name="refine_OS4")(z, train)
        z = ResLayerDec(midplanes, self.layers[3], 2, name="layer4")(z, train, update_sn) + fea2
        z = SNConvTranspose(32, name="conv1")(z, update_sn)
        z = BatchNorm(name="bn1")(z, train)
        z = nn.leaky_relu(z, 0.2) + fea1
        x_os1 = RefineHead(32, self.max_inst, k, name="refine_OS1")(z, train)

        to_maps = lambda t: jnp.transpose(t, (0, 3, 1, 2)).astype(jnp.float32)  # alphas stay f32
        x_os4 = resize_bilinear(to_maps(x_os4), (h, w), align_corners=False)
        x_os4 = (jnp.tanh(x_os4) + 1.0) / 2.0
        x_os1 = (jnp.tanh(to_maps(x_os1)) + 1.0) / 2.0
        if not train:
            x_os4 = x_os4[:, :n_i]
            x_os1 = x_os1[:, :n_i]

        ret = {"alpha_os1": x_os1, "alpha_os4": x_os4, "alpha_os8": x_os8}

        # PRM fuse on a DETACHED os8 (reference :120-129)
        rng = self.make_rng("unknown") if train else None
        rngs = jax.random.split(rng, 2) if train else [None, None]
        alpha = jax.lax.stop_gradient(x_os8)
        w4 = compute_unknown(alpha, k_size=30, is_train=train, rng=rngs[0]).astype(alpha.dtype)
        alpha = jnp.where(w4 > 0, x_os4, alpha)
        w1 = compute_unknown(alpha, k_size=15, is_train=train, rng=rngs[1]).astype(alpha.dtype)
        alpha = jnp.where(w1 > 0, x_os1, alpha)

        ret["refined_masks"] = alpha
        ret["weight_os4"] = w4
        ret["weight_os1"] = w1
        ret["detail_mask"] = unknown_os8
        ret["loss_max_atten"] = loss_max_atten
        return ret


def res_shortcut_inst_matt_22(**kwargs) -> ResShortCutInstMattDec:
    known = {f.name for f in ResShortCutInstMattDec.__dataclass_fields__.values()} - {"name", "parent"}
    return ResShortCutInstMattDec(layers=(2, 3, 3, 2),
                                  **{k: v for k, v in kwargs.items() if k in known and k != "layers"})

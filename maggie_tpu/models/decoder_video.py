"""Video detail decoder: temporal memory + bidirectional diff-weighted fusion.

Rebuilds reference ``decoder/resnet_inst_matt_spconv_temp.py``
(``ResShortCut_InstMattSpconv_BiTempSpar_Dec``): the image decoder plus

- a ConvGRU over os8 attention features hooked into ``refine_OS8`` (``:22,89-93``);
- a ``diff_module`` conv stack predicting per-frame-pair change maps (``:25-33``);
- ``bidirectional_fusion`` blending per-frame alphas with sigmoid'd diffs (``:35-79``);
- inference-only instance bounding-box masking via (quirk-faithful) Gaussian
  smoothing, made branchless for jit (``:122-142``);
- temporal sparsity losses: BCE + dtSSD on the diff maps (``:183-203``).

Cross-clip memory note: the reference's eval engine only carries ``mem_feat`` when
it is a tuple (``engine/test.py:252-254``), and the ConvGRU hidden state is a plain
tensor — so released-model evaluation effectively runs with fresh memory per clip.
We replicate that contract at the engine level.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import flax.linen as nn

from .conv_gru import ConvGRU
from .decoder_sparse import ResShortCutInstMattSpconvDec
from .layers import BatchNorm, Conv, SNConv
from .losses import loss_dtssd
from ..ops.morphology import compute_unknown
from ..ops.resize import resize_bilinear
from ..ops.smoothing import gaussian_smoothing


class DiffModule(nn.Module):
    """SN conv1x1 -> BN -> ReLU -> SN conv3x3 -> BN -> ReLU -> conv3x3 -> 1 channel
    (reference ``:25-33``). Input NHWC (concat of two frames' features)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, update_sn: bool = False) -> jax.Array:
        x = SNConv(64, (1, 1), (1, 1), (0, 0), name="conv1")(x, update_sn)
        x = BatchNorm(name="bn1")(x, train)
        x = nn.relu(x)
        x = SNConv(32, (3, 3), (1, 1), (1, 1), name="conv2")(x, update_sn)
        x = BatchNorm(name="bn2")(x, train)
        x = nn.relu(x)
        return Conv(1, (3, 3), (1, 1), (1, 1), name="conv3")(x)


class ResShortCutInstMattSpconvTempDec(ResShortCutInstMattSpconvDec):
    temp_method: str = "bi"

    def setup(self):
        super().setup()
        self._temp_mode = self.temp_method.split("_")[0]
        self._use_fusion = "fusion" in self.temp_method
        self._use_temp = self.temp_method != "none"
        # reference hardcodes ConvGRU(128) == its atten_dim (:22); track atten_dim
        self.os8_temp_module = ConvGRU(self.atten_dim, name="os8_temp_module")
        self.diff_module = DiffModule(name="diff_module")

    def bidirectional_fusion(self, feat: jax.Array, preds: jax.Array,
                             train: bool, update_sn: bool):
        """feat: (b, n_f, h8, w8, c); preds: (b, n_f, n_i, H, W). Reference ``:35-79``."""
        n_f = feat.shape[1]
        h, w = preds.shape[-2:]

        def diff(a, b_):
            d = self.diff_module(jnp.concatenate([a, b_], axis=-1), train, update_sn)
            d = jnp.transpose(d, (0, 3, 1, 2)).astype(jnp.float32)  # (b, 1, h8, w8); logits f32
            return resize_bilinear(d, (h, w), align_corners=False)

        fwd_diffs = []
        fwd_preds = [preds[:, 0]]
        for i in range(1, n_f):
            d = diff(feat[:, i - 1], feat[:, i])
            fwd_diffs.append(d)
            s = nn.sigmoid(d)
            fwd_preds.append(fwd_preds[-1] * (1 - s) + preds[:, i] * s)
        fwd_diffs = [jnp.zeros_like(fwd_diffs[0])] + fwd_diffs
        diff_forward = jnp.stack(fwd_diffs, axis=1)

        bwd_diffs = []
        bwd_preds = [preds[:, n_f - 1]]
        for i in range(n_f - 1, 0, -1):
            d = diff(feat[:, i], feat[:, i - 1])
            bwd_diffs.append(d)
            s = nn.sigmoid(d)
            bwd_preds.append(bwd_preds[-1] * (1 - s) + preds[:, i - 1] * s)
        bwd_preds = bwd_preds[::-1]
        bwd_diffs = bwd_diffs[::-1] + [jnp.zeros_like(bwd_diffs[-1])]
        diff_backward = jnp.stack(bwd_diffs, axis=1)

        fused = [fwd_preds[0]]
        for i in range(1, n_f - 1):
            fused.append((fwd_preds[i] + bwd_preds[i]) / 2)
        if n_f > 1:
            fused.append(bwd_preds[n_f - 1])
        return diff_forward, diff_backward, jnp.stack(fused, axis=1)

    def _bbox_mask(self, x_os8: jax.Array, n_i: int) -> jax.Array:
        """Branchless instance bbox mask (reference ``:122-142``): per map, bound the
        smoothed coarse prediction above 0.1, pad 30px; all-ones when empty."""
        thresh, padding = 0.1, 30
        N, C, H, W = x_os8.shape
        smooth = gaussian_smoothing(x_os8, sigma=3)
        m = smooth > thresh
        y_idx = jnp.arange(H)
        x_idx = jnp.arange(W)
        row_any = jnp.any(m, axis=-1)  # (N, C, H)
        col_any = jnp.any(m, axis=-2)  # (N, C, W)
        big = jnp.int32(10 ** 9)
        y_min = jnp.min(jnp.where(row_any, y_idx, big), axis=-1)
        y_max = jnp.max(jnp.where(row_any, y_idx, -big), axis=-1)
        x_min = jnp.min(jnp.where(col_any, x_idx, big), axis=-1)
        x_max = jnp.max(jnp.where(col_any, x_idx, -big), axis=-1)
        y_lo = jnp.maximum(0, y_min - padding)[..., None]
        y_hi = jnp.minimum(y_max + padding, H)[..., None]
        x_lo = jnp.maximum(0, x_min - padding)[..., None]
        x_hi = jnp.minimum(x_max + padding, W)[..., None]
        ymask = (y_idx[None, None] >= y_lo) & (y_idx[None, None] < y_hi)  # (N, C, H)
        xmask = (x_idx[None, None] >= x_lo) & (x_idx[None, None] < x_hi)  # (N, C, W)
        box = ymask[..., :, None] & xmask[..., None, :]
        nonempty = jnp.any(m, axis=(-1, -2))[..., None, None]
        return jnp.where(nonempty, box, True).astype(x_os8.dtype)

    def __call__(self, x, mid_fea, b, n_f, n_i, masks, gt_alphas=None,
                 use_mask_atten: bool = False, use_gt_guidance: bool = False,
                 train: bool = False, update_sn: bool = False,
                 mem_feat=None, spar_gt=None, **kwargs) -> dict:
        fea1, fea2, fea3, fea4, fea5 = mid_fea["shortcut"]
        image = mid_fea["image"]
        h, w = image.shape[1], image.shape[2]
        sc0 = ((mid_fea["shortcut0_fn"], mid_fea["shortcut0_input"])
               if fea1 is None else None)
        sc1 = ((mid_fea["shortcut1_fn"], mid_fea["shortcut1_input"])
               if fea2 is None else None)

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

        z = self.layer1(x, train, update_sn) + fea5
        z = self.layer2(z, train, update_sn) + fea4

        # os8 attention with ConvGRU memory hook (:89-93); video path never uses
        # mask attention (use_mask_atten=False, :90)
        temp_fn = partial(self.os8_temp_module.propagate_features, n_f=n_f,
                          prev_h_state=mem_feat, temp_method=self._temp_mode)
        x_os8_logit, feat8, queries, loss_max_atten, hidden_state = self.refine_OS8(
            z, masks5, use_mask_atten=False, gt_mask=gt_masks,
            aggregate_mem_fn=temp_fn, train=train)
        new_mem_feat = hidden_state

        feat_os8 = jax.lax.stop_gradient(
            feat8.reshape(b, n_f, *feat8.shape[1:]))  # (b, n_f, h8, w8, c), :96

        if not train:
            # exact: per-channel ops commute with the slot slice (see decoder_sparse)
            x_os8_logit = x_os8_logit[:, :n_i]
        x_os8 = resize_bilinear(x_os8_logit, (h, w), align_corners=False)
        x_os8 = (jnp.tanh(x_os8) + 1.0) / 2.0
        if train:
            x_os8 = x_os8 * valid_masks

        if train and gt_alphas is not None:
            gate = jnp.logical_or(use_gt_guidance, jnp.sum(x_os8) == 0)
            guided_mask_os8 = jnp.where(gate, gt_alphas, x_os8)
            is_use_alphas_gt = gate
        else:
            guided_mask_os8 = x_os8
            is_use_alphas_gt = None

        if not train:
            x_os8 = jnp.where(x_os8 >= 0.95, 1.0, x_os8)  # :115-117

        rng = self.make_rng("unknown") if train else None
        rngs = jax.random.split(rng, 4) if train else [None] * 4
        unknown_os8 = compute_unknown(guided_mask_os8, k_size=30, is_train=False)
        if train:
            empty = jnp.max(unknown_os8) == 0
            patch = jnp.zeros_like(unknown_os8).at[:, :, 200:250, 200:250].set(1.0)
            unknown_os8 = jnp.where(empty, patch, unknown_os8)
        else:
            box = self._bbox_mask(x_os8, n_i)
            unknown_os8 = unknown_os8 * box
            x_os8 = x_os8 * box

        q = jnp.broadcast_to(queries[:, None], (b, n_f) + queries.shape[1:])
        q = q.reshape(b * n_f, *queries.shape[1:])[:, :x_os8.shape[1]]
        if self.sparse_mode == "block":
            x_os4_log, x_os1_log = self.predict_details_block(
                feat8, unknown_os8, q, fea1, fea2, fea3, train, sc0=sc0, sc1=sc1)
        else:
            x_os4_log, x_os1_log = self.predict_details(
                feat8, unknown_os8, q, fea1, fea2, fea3, train)
        x_os4 = resize_bilinear(x_os4_log.astype(jnp.float32), (h, w), align_corners=False)
        x_os4 = (jnp.tanh(x_os4) + 1.0) / 2.0
        x_os1 = (jnp.tanh(x_os1_log.astype(jnp.float32)) + 1.0) / 2.0

        ret = {"alpha_os1": x_os1, "alpha_os4": x_os4, "alpha_os8": x_os8}
        alpha_pred, weight_os4, weight_os1 = self.fuse(
            x_os1, x_os4, x_os8, unknown_os8, train, rngs[0], rngs[1])
        ret["refined_masks"] = alpha_pred
        ret["detail_mask"] = unknown_os8
        if self._use_temp:
            ret["mem_feat"] = new_mem_feat

        if train and gt_alphas is not None:
            w4_gt = compute_unknown(gt_alphas, k_size=30, is_train=True, rng=rngs[2]) * unknown_os8
            w1_gt = compute_unknown(gt_alphas, k_size=15, is_train=True, rng=rngs[3]) * unknown_os8
            weight_os4 = jnp.where(is_use_alphas_gt, w4_gt, weight_os4)
            weight_os1 = jnp.where(is_use_alphas_gt, w1_gt, weight_os1)
        ret["weight_os4"] = weight_os4
        ret["weight_os1"] = weight_os1

        temp_alpha = alpha_pred.reshape(b, n_f, *alpha_pred.shape[1:])
        diff_forward, diff_backward, temp_fused = self.bidirectional_fusion(
            feat_os8, temp_alpha, train, update_sn)

        if train or self._use_fusion:
            ret["temp_alpha"] = temp_fused
            ret["diff_forward"] = nn.sigmoid(diff_forward)
            ret["diff_backward"] = nn.sigmoid(diff_backward)

        if train:
            ret["loss_max_atten"] = loss_max_atten
            if spar_gt is not None:
                ret.update(self.loss_temporal_sparsity(diff_forward, diff_backward, spar_gt, b))
        return ret

    def loss_temporal_sparsity(self, diff_forward, diff_backward, spar_gt, b):
        """BCE + dtSSD on the diff maps (reference ``:183-203``).
        diff_*: (b, n_f, 1, H, W) logits; spar_gt: (b*n_f, n_i, H, W)."""
        loss = {}
        sg = spar_gt.reshape(b, -1, *spar_gt.shape[1:])  # (b, n_f, n_i, H, W)

        def bce(logits, labels):
            return jnp.mean(jnp.maximum(logits, 0) - logits * labels +
                            jnp.log1p(jnp.exp(-jnp.abs(logits))))

        bce_f = bce(diff_forward[:, 1:, 0], sg[:, 1:, 0])
        bce_b = bce(diff_backward[:, :-1, 0], sg[:, 1:, 0])
        loss["loss_temp_bce"] = bce_f + bce_b
        dt_f = loss_dtssd(nn.sigmoid(diff_forward[:, 1:]), sg[:, 1:, 0:1],
                          jnp.ones_like(sg[:, 1:, 0:1]))
        dt_b = loss_dtssd(nn.sigmoid(diff_backward[:, :-1]), sg[:, 1:, 0:1],
                          jnp.ones_like(sg[:, 1:, 0:1]))
        loss["loss_temp_dtssd"] = dt_f + dt_b
        loss["loss_temp"] = (loss["loss_temp_bce"] + dt_f + dt_b) * 0.25
        return loss


def res_shortcut_inst_matt_spconv_temp_22(**kwargs) -> ResShortCutInstMattSpconvTempDec:
    known = {f.name for f in ResShortCutInstMattSpconvTempDec.__dataclass_fields__.values()} - {"name", "parent"}
    return ResShortCutInstMattSpconvTempDec(
        layers=(2, 3, 3, 2),
        **{k: v for k, v in kwargs.items() if k in known and k != "layers"})

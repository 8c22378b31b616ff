"""MaGGIe architecture: encoder -> ASPP -> decoder, PRM fusion, full training loss.

Rebuilds reference ``maggie/network/arch/maggie.py``: input preparation (mask padding
to ``num_masks`` slots — zero-pad at inference, dataset-side random slots in training,
``:200-235``), image+mask channel stacking (``:232``), PRM fusion of os8/os4/os1
(``fuse``, ``:51-61``), and the weighted L1 + Laplacian + Sobel-gradient + dtSSD loss
at three scales with the os1 x2 weighting (``compute_loss``, ``:268-368``), the os8
reweighting by the unknown-region union (``:278-281``), and the 75%/25% choice
between PRM weights and the detail mask during training (``:98-101``; the bernoulli
is drawn host-side and passed as the static ``use_prm_weights`` flag).

Interface conventions (TPU-native): images are (b, n_f, H, W, 3) float NHWC; masks
(b, n_f, n_i, hm, wm); alphas/transitions (b, n_f, n_i, H, W). Python-level control
(warmup gates, bernoulli draws) enters as STATIC bools so each variant compiles once.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .aspp import ASPP
from .losses import gradient_loss, lap_loss, loss_dtssd, regression_loss
from ..ops.morphology import compute_unknown
from ..ops.resize import resize_nearest


class MaGGIe(nn.Module):
    """cfg is the ``model`` subtree of the framework config (a plain dict/ConfigNode)."""

    cfg: Any

    def setup(self):
        from . import build_decoder, build_encoder  # local import to avoid cycle
        mc = self.cfg  # flax freezes dict fields to FrozenDict: use [] access
        self.num_masks = int(mc["encoder_args"].get("num_mask", 1))
        enc_args = dict(mc["encoder_args"])
        # block-sparse decoders read the os1 skip features only at selected
        # blocks: let the encoder defer that branch to patch domain at eval
        # (see ResShortCutD.lazy_os1_shortcut) unless explicitly overridden
        if (mc["decoder"] in ("res_shortcut_inst_matt_spconv_22",
                              "res_shortcut_inst_matt_spconv_temp_22")
                and mc["decoder_args"].get("sparse_mode") == "block"
                and not mc["decoder_args"].get("phase_rung", False)
                and "lazy_os1_shortcut" not in enc_args
                and mc["encoder"] in ("res_shortcut_29", "res_shortcut_embed_29")):
            enc_args["lazy_os1_shortcut"] = True
        # lazy_os2_shortcut (same move one octave up) is NOT auto-enabled: the
        # same-session A/B measured it 31% SLOWER (183.0 -> 125.4 f/s bf16) —
        # the 36x36 patch gather + patch-domain convs cost more than the dense
        # 288x512x32 branch they replace (docs/DESIGN.md round-5 ledger). The
        # flag remains available (encoder_args.lazy_os2_shortcut) and bit-exact.
        self.encoder = build_encoder(mc["encoder"], enc_args)
        self.aspp = ASPP(in_channels=mc["aspp"]["in_channels"],
                         out_channels=mc["aspp"]["out_channels"], name="aspp_mod")
        self.decoder = build_decoder(mc["decoder"], dict(mc["decoder_args"]))
        self.loss_alpha_w = mc["loss_alpha_w"]
        self.loss_alpha_type = mc["loss_alpha_type"]
        self.loss_alpha_lap_w = mc["loss_alpha_lap_w"]
        self.loss_alpha_grad_w = mc["loss_alpha_grad_w"]
        self.loss_atten_w = mc["loss_atten_w"]
        self.reweight_os8 = mc["loss_reweight_os8"]
        self.loss_dtssd_w = mc["loss_dtSSD_w"]
        # mixed precision (the reference's AMP fp16, engine/train.py:208,227-229 ->
        # bf16 on TPU, no loss scaling): activations run in compute_dtype, params
        # stay f32 masters, BN/LN/softmax/alphas/losses stay f32.
        self.compute_dtype = (jnp.bfloat16 if str(mc.get("precision", "fp32")) in
                              ("bf16", "bfloat16", "16") else jnp.float32)

    # ----- PRM fusion for decoders without their own (reference ``fuse``, :51-61) -----
    def fuse(self, pred: dict, train: bool, rng4=None, rng1=None):
        a1, a4, a8 = pred["alpha_os1"], pred["alpha_os4"], pred["alpha_os8"]
        alpha = a8
        w4 = compute_unknown(alpha, k_size=30, is_train=train, rng=rng4)
        alpha = jnp.where(w4 > 0, a4, alpha)
        w1 = compute_unknown(alpha, k_size=15, is_train=train, rng=rng1)
        alpha = jnp.where(w1 > 0, a1, alpha)
        return alpha, w4, w1

    def __call__(
        self,
        batch: dict,
        train: bool = False,
        use_mask_atten: bool = False,     # static: iter < warmup_mask_atten_iter
        use_gt_guidance: bool = False,    # static: detail-branch warmup gate
        use_prm_weights: bool = True,     # static: the 75% bernoulli draw
        atten_loss_enabled: bool = True,  # static: iter >= warmup_mask_atten_iter
        update_sn: bool = False,
        mem_feat=None,
        **kwargs,
    ):
        x = batch["image"]                      # (b, n_f, H, W, 3)
        masks = batch["mask"]                   # (b, n_f, n_i, hm, wm)
        alphas = batch.get("alpha")             # (b, n_f, n_i, H, W)
        trans_gt = batch.get("transition")
        b, n_f, h, w, _ = x.shape
        n_i = masks.shape[2]

        x = x.reshape(b * n_f, h, w, 3).astype(self.compute_dtype)
        if masks.shape[-1] != w:
            masks = resize_nearest(masks.reshape(b * n_f, n_i, *masks.shape[-2:]), (h, w))
        else:
            masks = masks.reshape(b * n_f, n_i, h, w)
        masks = masks.astype(x.dtype)

        # ----- prepare encoder input (reference prepare_input, :200-235) -----
        # Training datasets already scatter instances into random slots of max_inst
        # (reference ``him.py:159-174``), so here padding is only the inference-time
        # zero-pad at the end.
        if self.num_masks > 0:
            inp_masks = masks
            if self.num_masks - n_i > 0:
                pad = jnp.zeros((b * n_f, self.num_masks - n_i, h, w), x.dtype)
                inp_masks = jnp.concatenate([masks, pad], axis=1)
                if train:
                    masks = inp_masks
                    if alphas is not None:
                        zpad = jnp.zeros((b, n_f, self.num_masks - n_i, h, w), alphas.dtype)
                        alphas = jnp.concatenate([alphas, zpad], axis=2)
                    if trans_gt is not None:
                        zpad = jnp.zeros((b, n_f, self.num_masks - n_i, h, w), trans_gt.dtype)
                        trans_gt = jnp.concatenate([trans_gt, zpad], axis=2)
                    n_i = self.num_masks
            # NHWC channel stack [RGB | masks]
            inp = jnp.concatenate([x, jnp.transpose(inp_masks, (0, 2, 3, 1))], axis=-1)
        else:
            inp = x

        alphas_flat = alphas.reshape(b * n_f, n_i, h, w) if alphas is not None else None
        trans_flat = trans_gt.reshape(b * n_f, n_i, h, w) if trans_gt is not None else None

        embedding, mid_fea = self.encoder(inp, train=train, update_sn=update_sn)
        from jax.ad_checkpoint import checkpoint_name
        embedding = checkpoint_name(self.aspp(embedding, train=train), "stage")

        pred = self.decoder(
            embedding, mid_fea, b=b, n_f=n_f, n_i=n_i,
            masks=masks, gt_alphas=alphas_flat, spar_gt=trans_flat,
            use_mask_atten=use_mask_atten, use_gt_guidance=use_gt_guidance,
            train=train, update_sn=update_sn, mem_feat=mem_feat, **kwargs)
        if isinstance(pred, tuple):
            pred = pred[0]

        # ----- fusion -----
        weight_os1 = weight_os4 = None
        if "refined_masks" in pred:
            alpha_pred = pred.pop("refined_masks")
            if "detail_mask" in pred:
                weight_os4 = pred["detail_mask"].astype(alpha_pred.dtype)
                weight_os1 = weight_os4
        else:
            rng4 = self.make_rng("unknown") if train else None
            rng1 = self.make_rng("unknown") if train else None
            alpha_pred, weight_os4, weight_os1 = self.fuse(pred, train, rng4, rng1)

        if train and "weight_os4" in pred and use_prm_weights:
            weight_os4 = pred.pop("weight_os4")
            weight_os1 = pred.pop("weight_os1")
        else:
            pred.pop("weight_os4", None)
            pred.pop("weight_os1", None)

        output = self._transform_output(b, n_f, h, w, n_i, pred, alpha_pred, train)

        if train:
            assert alphas_flat is not None and trans_flat is not None
            valid = (jnp.sum(trans_flat, axis=(2, 3), keepdims=True) > 0).astype(jnp.float32)
            for k, v in list(pred.items()):
                if "loss" in k or k.startswith("mem_") or k in ("detail_mask",):
                    continue
                pred[k] = v * valid
            loss_dict = self.compute_loss(
                pred, weight_os4, weight_os1, alphas_flat, trans_flat,
                (b, n_f, self.num_masks, h, w))
            if "loss_max_atten" in pred and self.loss_atten_w > 0 and atten_loss_enabled:
                loss_dict["loss_max_atten"] = pred["loss_max_atten"]
                loss_dict["total"] = loss_dict["total"] + loss_dict["loss_max_atten"] * self.loss_atten_w
            self._extra_losses(pred, loss_dict)
            return output, loss_dict

        # inference: keep only the true instances
        for k, v in output.items():
            output[k] = v[:, :, :n_i]
        for k in pred:
            if k.startswith("mem_"):
                output[k] = pred[k]
        return output

    # ----- split eval forward for the streaming feature cache -----
    # Video streaming eval re-reads clip_length-overlap frames per window; the
    # encoder+ASPP half is strictly frame-local (2D convs; all temporal mixing
    # lives in the decoder), so its features can be carried across overlapping
    # windows EXACTLY instead of recomputed (the reference recomputes the full
    # window every step, ``maggie/engine/test.py:169-296``). The engine calls
    # ``encode_frames`` on the new frame(s) only and ``decode_window`` on the
    # rolled feature stack (engine/test.py eval_video, test.cache_features).

    def encode_frames(self, batch: dict) -> dict:
        """Frame-local eval half: input prep + encoder + ASPP. Returns a pure-
        array feature pack (leading dim = frames) that ``decode_window``
        consumes; cacheable/rollable across overlapping clip windows."""
        x = batch["image"]                      # (1, n_f, H, W, 3)
        masks = batch["mask"]                   # (1, n_f, n_i, hm, wm)
        b, n_f, h, w, _ = x.shape
        n_i = masks.shape[2]
        x = x.reshape(b * n_f, h, w, 3).astype(self.compute_dtype)
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
            inp = jnp.concatenate([x, jnp.transpose(inp_masks, (0, 2, 3, 1))], axis=-1)
        else:
            inp = x
        embedding, mid_fea = self.encoder(inp, train=False, update_sn=False)
        embedding = self.aspp(embedding, train=False)
        fea1, fea2, fea3, fea4, fea5 = mid_fea["shortcut"]
        feats = {"embedding": embedding, "fea3": fea3,
                 "fea4": fea4, "fea5": fea5, "image": mid_fea["image"],
                 "masks": masks}
        if fea1 is not None:
            feats["fea1"] = fea1
        if fea2 is not None:
            feats["fea2"] = fea2
        if "shortcut0_input" in mid_fea:
            feats["inp"] = mid_fea["shortcut0_input"]
        if "shortcut1_input" in mid_fea:
            feats["x1"] = mid_fea["shortcut1_input"]
        return feats

    def decode_window(self, feats: dict, prev_pred=None,
                      mem_feat=None, **kwargs) -> dict:
        """Decoder half over a (possibly cached) stacked feature window.
        Output is identical to the eval branch of ``__call__`` on the same
        frames (b=1 streaming eval)."""
        masks = feats["masks"]
        n_f, n_i, h, w = masks.shape
        b = 1
        mid_fea = {"shortcut": (feats.get("fea1"), feats.get("fea2"),
                                feats["fea3"], feats["fea4"], feats["fea5"]),
                   "image": feats["image"]}
        backbone = getattr(self.encoder, "backbone", self.encoder)
        if "inp" in feats:
            mid_fea["shortcut0_fn"] = (
                lambda patches, inner_mask=None: backbone.shortcut_0(
                    patches, False, False, inner_mask))
            mid_fea["shortcut0_input"] = feats["inp"]
        if "x1" in feats:
            mid_fea["shortcut1_fn"] = (
                lambda patches, inner_mask=None: backbone.shortcut_1(
                    patches, False, False, inner_mask))
            mid_fea["shortcut1_input"] = feats["x1"]
        pred = self.decoder(feats["embedding"], mid_fea, b=b, n_f=n_f, n_i=n_i,
                            masks=masks, train=False, update_sn=False,
                            mem_feat=mem_feat, **kwargs)
        if isinstance(pred, tuple):
            pred = pred[0]
        if "refined_masks" in pred:
            alpha_pred = pred.pop("refined_masks")
        else:
            alpha_pred, _, _ = self.fuse(pred, False, None, None)
        pred.pop("weight_os4", None)
        pred.pop("weight_os1", None)
        output = self._transform_output(b, n_f, h, w, n_i, pred, alpha_pred, False)
        for k, v in output.items():
            output[k] = v[:, :, :n_i]
        for k in pred:
            if k.startswith("mem_"):
                output[k] = pred[k]
        return self._finalize_eval(output, prev_pred)

    def _finalize_eval(self, output: dict, prev_pred) -> dict:
        """Hook for subclass inference-time postprocessing (MaGGIeTemp's
        temporal propagation rule)."""
        return output

    def _extra_losses(self, pred, loss_dict):
        """Hook for subclass losses (reference ``update_additional_decoder_loss``)."""

    def _transform_output(self, b, n_f, h, w, n_i, pred, alpha_pred, train):
        out = {}
        n_out = self.num_masks if (train and self.num_masks > 0) else n_i
        if "alpha_os1" in pred:
            out["alpha_os1"] = pred["alpha_os1"][:, :n_out].reshape(b, n_f, n_out, h, w)
            out["alpha_os4"] = pred["alpha_os4"][:, :n_out].reshape(b, n_f, n_out, h, w)
        out["alpha_os8"] = pred["alpha_os8"][:, :n_out].reshape(b, n_f, n_out, h, w)
        out["refined_masks"] = alpha_pred[:, :n_out].reshape(b, n_f, n_out, h, w)
        if "detail_mask" in pred:
            out["detail_mask"] = pred["detail_mask"][:, :n_out].reshape(b, n_f, n_out, h, w)
        return out

    def compute_loss(self, pred, weight_os4, weight_os1, alphas, trans_gt, alpha_shape,
                     reweight_os8=None):
        """Reference ``compute_loss`` (maggie.py:268-368)."""
        if reweight_os8 is None:
            reweight_os8 = self.reweight_os8
        a1 = pred.get("alpha_os1")
        a4 = pred.get("alpha_os4")
        a8 = pred["alpha_os8"]
        loss_dict = {}

        valid = (jnp.sum(alphas, axis=(2, 3), keepdims=True) > 0).astype(jnp.float32)
        weight_os8 = jnp.ones_like(a8) * valid
        if reweight_os8:
            unk_gt = (alphas <= 254.0 / 255.0) & (alphas >= 1.0 / 255.0)
            unk_pred = (a8 <= 254.0 / 255.0) & (a8 >= 1.0 / 255.0)
            weight_os8 = (unk_gt | unk_pred).astype(weight_os8.dtype) + weight_os8

        n_i = alphas.shape[1]
        if self.num_masks - n_i > 0:
            pad = jnp.zeros((alphas.shape[0], self.num_masks - n_i) + alphas.shape[-2:], alphas.dtype)
            alphas = jnp.concatenate([alphas, pad], axis=1)
            trans_gt = jnp.concatenate([trans_gt, pad], axis=1)

        total = 0.0
        if self.loss_alpha_w > 0:
            rec = 0.0
            if a1 is not None:
                r1 = regression_loss(a1, alphas, self.loss_alpha_type, weight_os1)
                r4 = regression_loss(a4, alphas, self.loss_alpha_type, weight_os4)
                r8 = regression_loss(a8, alphas, self.loss_alpha_type, weight_os8)
                rec = r1 * 2 + r4 + r8
                loss_dict.update(loss_rec_os1=r1, loss_rec_os4=r4, loss_rec_os8=r8)
            loss_dict["loss_rec"] = rec
            total += rec * self.loss_alpha_w

        if self.loss_alpha_lap_w > 0:
            lap = 0.0
            if a1 is not None:
                hh, ww = a8.shape[-2:]
                def as_n1hw(t):
                    return t.reshape(-1, 1, hh, ww)
                l1 = lap_loss(as_n1hw(a1), as_n1hw(alphas), as_n1hw(weight_os1))
                l4 = lap_loss(as_n1hw(a4), as_n1hw(alphas), as_n1hw(weight_os4))
                l8 = lap_loss(as_n1hw(a8), as_n1hw(alphas), as_n1hw(weight_os8))
                loss_dict.update(loss_lap_os1=l1, loss_lap_os4=l4, loss_lap_os8=l8)
                lap = l1 * 2 + l4 + l8
            loss_dict["loss_lap"] = lap
            total += lap * self.loss_alpha_lap_w

        if self.loss_alpha_grad_w > 0:
            grad = 0.0
            if a1 is not None:
                g1 = gradient_loss(a1, alphas, weight_os1)
                g4 = gradient_loss(a4, alphas, weight_os4)
                g8 = gradient_loss(a8, alphas, weight_os8)
                grad = g1 * 2 + g4 + g8
                loss_dict.update(loss_grad_os1=g1, loss_grad_os4=g4, loss_grad_os8=g8)
            loss_dict["loss_grad"] = grad
            total += grad * self.loss_alpha_grad_w

        if self.loss_dtssd_w > 0:
            a8r = a8.reshape(alpha_shape)
            a4r = a4.reshape(alpha_shape)
            a1r = a1.reshape(alpha_shape)
            ar = alphas.reshape(alpha_shape)
            d1 = loss_dtssd(a1r, ar, weight_os1.reshape(alpha_shape))
            d4 = loss_dtssd(a4r, ar, weight_os4.reshape(alpha_shape))
            d8 = loss_dtssd(a8r, ar, weight_os8.reshape(alpha_shape))
            dt = d1 * 2 + d4 + d8
            loss_dict.update(loss_dtSSD_os1=d1, loss_dtSSD_os4=d4, loss_dtSSD_os8=d8, loss_dtSSD=dt)
            total += dt * self.loss_dtssd_w

        loss_dict["total"] = total
        return loss_dict


class Dummy(nn.Module):
    """Passthrough fake arch (reference ``arch/dummy.py:3-9``): prediction = input mask.
    Smoke-tests the engine/data/metric loop without real compute."""

    cfg: Any = None

    @nn.compact
    def __call__(self, batch: dict, train: bool = False, **kwargs):
        masks = batch["mask"]
        b, n_f, n_i = masks.shape[:3]
        h, w = batch["image"].shape[2:4]
        if masks.shape[-1] != w:
            m = resize_nearest(masks.reshape(b * n_f, n_i, *masks.shape[-2:]), (h, w))
            m = m.reshape(b, n_f, n_i, h, w)
        else:
            m = masks
        # one inert scalar param so the engine's optimizer/checkpoint paths have
        # a non-empty pytree to drive (zero loss -> zero gradient)
        scale = self.param("scale", lambda _rng: jnp.float32(0.0))
        out = {"refined_masks": m.astype(jnp.float32), "alpha_os8": m.astype(jnp.float32)}
        if train:
            return out, {"total": jnp.mean(m.astype(jnp.float32)) * 0.0 + scale * 0.0}
        return out

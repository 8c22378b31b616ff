"""MaGGIe video arch (reference ``maggie/network/arch/maggie_temp.py``):
the image arch plus forward/backward diff-map outputs and the inference-time
temporal propagation rule over the 3-frame window (``:34-77``)."""

from __future__ import annotations

import jax.numpy as jnp

from .maggie import MaGGIe


class MaGGIeTemp(MaGGIe):

    def _transform_output(self, b, n_f, h, w, n_i, pred, alpha_pred, train):
        out = super()._transform_output(b, n_f, h, w, n_i, pred, alpha_pred, train)
        diff_fwd = pred.pop("diff_forward", None)
        diff_bwd = pred.pop("diff_backward", None)
        temp_alpha = pred.pop("temp_alpha", None)
        if diff_bwd is not None:
            n_out = out["refined_masks"].shape[2]
            out["diff_pred_backward"] = jnp.broadcast_to(
                diff_bwd, diff_bwd.shape[:2] + (n_out,) + diff_bwd.shape[3:])
            out["diff_pred_forward"] = jnp.broadcast_to(
                diff_fwd, diff_fwd.shape[:2] + (n_out,) + diff_fwd.shape[3:])
            out["temp_alpha"] = temp_alpha
        return out

    def _extra_losses(self, pred, loss_dict):
        if "loss_temp" in pred:
            loss_dict["loss_temp_bce"] = pred["loss_temp_bce"]
            loss_dict["loss_temp"] = pred["loss_temp"]
            loss_dict["total"] = loss_dict["total"] + pred["loss_temp"]
        if "loss_temp_dtssd" in pred:
            loss_dict["loss_temp_dtssd"] = pred["loss_temp_dtssd"]

    def __call__(self, batch, train: bool = False, prev_pred=None, **kwargs):
        result = super().__call__(batch, train=train, prev_pred=prev_pred, **kwargs)
        if train:
            output, loss_dict = result
            return output, loss_dict
        return self._finalize_eval(result, prev_pred)

    def _finalize_eval(self, output: dict, prev_pred) -> dict:
        # alpha-matte level temporal aggregation (reference ``:37-75``)
        if "diff_pred_forward" in output:
            alphas = output["refined_masks"]  # (1, n_f, n_i, H, W)
            pp = prev_pred if prev_pred is not None else alphas[:, 0]
            next_pred = alphas[:, -1]
            diff_fwd = (output["diff_pred_forward"] > 0.5).astype(alphas.dtype)
            diff_bwd = (output["diff_pred_backward"] > 0.5).astype(alphas.dtype)

            pred_f01 = pp * (1 - diff_fwd[:, 1]) + alphas[:, 1] * diff_fwd[:, 1]
            pred_b21 = next_pred * (1 - diff_bwd[:, 1]) + alphas[:, 1] * diff_bwd[:, 1]
            disagree = jnp.abs(pred_f01 - pred_b21) > 0.0
            pred_f01 = jnp.where(disagree, alphas[:, 1], pred_f01)
            frame1 = pred_f01
            frame2 = pred_f01 * (1 - diff_fwd[:, 2]) + next_pred * diff_fwd[:, 2]
            alphas = jnp.concatenate(
                [alphas[:, :1], frame1[:, None], frame2[:, None]] +
                ([alphas[:, 3:]] if alphas.shape[1] > 3 else []), axis=1)
            output["refined_masks"] = alphas
        return output

"""Baseline arch smoke tests: MGM (+SingInst/stacked), SparseMat, TCVOM — eval
forward shapes/finiteness and train loss + grads."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from maggie_tpu.config import load_config
from maggie_tpu.models import build_model


def _batch(b=1, n_f=1, n_i=2, h=64, w=64, seed=0, with_gt=True):
    rs = np.random.RandomState(seed)
    batch = {
        "image": jnp.asarray(rs.rand(b, n_f, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray((rs.rand(b, n_f, n_i, h, w) > 0.6).astype(np.float32)),
    }
    if with_gt:
        batch["alpha"] = jnp.asarray(rs.rand(b, n_f, n_i, h, w).astype(np.float32))
        batch["transition"] = jnp.asarray((rs.rand(b, n_f, n_i, h, w) > 0.7).astype(np.float32))
    return batch


def _shrink(cfg):
    if "atten_dim" in cfg.model.decoder_args:
        cfg.model.decoder_args.atten_dim = 32
        cfg.model.decoder_args.final_channel = 32
    return cfg


def _init_and_eval(cfg, batch, **kwargs):
    # jitted so the persistent compile cache makes suite reruns cheap; eager
    # apply of full models costs minutes per test on this 1-core host
    model = build_model(cfg.model)
    variables = jax.jit(
        lambda r, b: model.init({"params": r}, b, train=False, **kwargs)
    )(jax.random.PRNGKey(0), batch)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False, **kwargs))(variables, batch)
    return model, variables, out


def _train_apply(model, variables, batch, seed=1):
    def f(v, b, r1, r2):
        return model.apply(v, b, train=True,
                           rngs={"unknown": r1, "dropout": r2},
                           mutable=["batch_stats", "spectral"])
    return jax.jit(f)(variables, batch, jax.random.PRNGKey(seed),
                      jax.random.PRNGKey(seed + 1))


def test_mgm_singinst_eval_and_train():
    cfg = load_config("configs/mgm.yaml")
    batch = _batch(n_i=2, with_gt=False)
    model, variables, out = _init_and_eval(cfg, batch)
    assert out["refined_masks"].shape == (1, 1, 2, 64, 64)
    a = np.asarray(out["refined_masks"])
    assert np.isfinite(a).all() and a.min() >= 0 and a.max() <= 1

    (o, loss), _ = _train_apply(model, variables, _batch(n_i=1))
    assert np.isfinite(float(loss["total"]))


def test_mgm_stacked_eval():
    cfg = load_config("configs/mgm_stacked.yaml")
    batch = _batch(n_i=3, with_gt=False)
    _, _, out = _init_and_eval(cfg, batch)
    assert out["refined_masks"].shape == (1, 1, 3, 64, 64)
    assert np.isfinite(np.asarray(out["refined_masks"])).all()


def test_sparsemat_eval_and_train():
    cfg = load_config("configs/sparsemat_image.yaml")
    batch = _batch(n_i=2, h=128, w=128, with_gt=False)
    model, variables, out = _init_and_eval(cfg, batch)
    assert out["refined_masks"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["refined_masks"])).all()

    tb = _batch(n_i=1, h=128, w=128)
    (o, loss), _ = _train_apply(model, variables, tb)
    assert np.isfinite(float(loss["total"]))
    for k in ["loss_rec", "loss_lap", "loss_grad"]:
        assert k in loss


def test_sparsemat_video_streaming():
    cfg = load_config("configs/sparsemat_video.yaml")
    batch = _batch(n_f=3, n_i=1, h=128, w=128, with_gt=False)
    _, _, out = _init_and_eval(cfg, batch)
    assert out["refined_masks"].shape == (1, 3, 1, 128, 128)
    assert np.isfinite(np.asarray(out["refined_masks"])).all()


def test_tcvom_eval_and_train():
    cfg = load_config("configs/mgm_tcvom.yaml")
    batch = _batch(n_f=3, n_i=1, with_gt=False)
    model, variables, out = _init_and_eval(cfg, batch)
    assert out["refined_masks"].shape == (1, 3, 1, 64, 64)
    assert np.isfinite(np.asarray(out["refined_masks"])).all()

    (o, loss), _ = _train_apply(model, variables, _batch(n_f=3, n_i=1), seed=3)
    assert np.isfinite(float(loss["total"]))
    assert "loss_atten" in loss


def test_tcvom_stacked_eval():
    cfg = load_config("configs/mgm_stacked_tcvom.yaml")
    batch = _batch(n_f=3, n_i=2, with_gt=False)
    _, _, out = _init_and_eval(cfg, batch)
    assert out["refined_masks"].shape == (1, 3, 2, 64, 64)


def test_inst_matt_dense_ablation_decoder():
    cfg = load_config("configs/maggie_image.yaml")
    cfg.model.decoder = "res_shortcut_inst_matt_22"
    cfg.model.decoder_args.update(dict(atten_dim=32, final_channel=64, max_inst=3))
    cfg.model.encoder_args.num_mask = 3
    batch = _batch(n_i=2, with_gt=False)
    model, variables, out = _init_and_eval(cfg, batch)
    assert out["refined_masks"].shape == (1, 1, 2, 64, 64)
    assert np.isfinite(np.asarray(out["refined_masks"])).all()

    (o, loss), _ = _train_apply(model, variables, _batch(n_i=2))
    assert np.isfinite(float(loss["total"]))

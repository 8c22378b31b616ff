"""End-to-end model smoke tests: init + forward (eval and train) on tiny shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from maggie_tpu.config import load_config
from maggie_tpu.models import build_model


def _image_cfg(num_mask=10, max_inst=10):
    cfg = load_config()
    cfg.model.arch = "MaGGIe"
    cfg.model.encoder = "res_shortcut_embed_29"
    cfg.model.encoder_args.num_embed = 3
    cfg.model.encoder_args.num_mask = num_mask
    cfg.model.decoder = "res_shortcut_inst_matt_spconv_22"
    cfg.model.decoder_args.update(dict(
        atten_block=2, atten_dim=32, atten_head=1, atten_stride=1,
        final_channel=32, max_inst=max_inst, use_id_pe=True,
        warmup_mask_atten_iter=0, warmup_detail_iter=3000, detail_mask_dropout=0.1))
    cfg.model.loss_alpha_grad_w = 0.05
    cfg.model.loss_alpha_lap_w = 0.05
    cfg.model.loss_atten_w = 5.0
    cfg.model.loss_dtSSD_w = 0.0
    return cfg


def _batch(b=1, n_f=1, n_i=2, h=64, w=64, seed=0, with_gt=True):
    rs = np.random.RandomState(seed)
    batch = {
        "image": jnp.asarray(rs.rand(b, n_f, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray((rs.rand(b, n_f, n_i, h // 8, w // 8) > 0.5).astype(np.float32)),
    }
    if with_gt:
        alpha = rs.rand(b, n_f, n_i, h, w).astype(np.float32)
        batch["alpha"] = jnp.asarray(alpha)
        batch["transition"] = jnp.asarray((rs.rand(b, n_f, n_i, h, w) > 0.7).astype(np.float32))
    return batch


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = _image_cfg()
    model = build_model(cfg.model)
    batch = _batch()
    variables = jax.jit(lambda r, b: model.init(
        {"params": r, "unknown": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        b, train=False))(jax.random.PRNGKey(0), batch)
    return model, variables


def test_eval_forward(model_and_vars):
    model, variables = model_and_vars
    batch = _batch(with_gt=False)
    out = model.apply(variables, batch, train=False)
    assert out["refined_masks"].shape == (1, 1, 2, 64, 64)
    assert out["alpha_os8"].shape == (1, 1, 2, 64, 64)
    a = np.asarray(out["refined_masks"])
    assert np.isfinite(a).all()
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_train_forward_loss(model_and_vars):
    model, variables = model_and_vars
    batch = _batch()
    (out, loss_dict), mutated = jax.jit(lambda v, b: model.apply(
        v, b, train=True,
        use_mask_atten=False, use_gt_guidance=True, use_prm_weights=True,
        atten_loss_enabled=True,
        rngs={"unknown": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats", "spectral"]))(variables, batch)
    assert np.isfinite(float(loss_dict["total"]))
    # all padded to max_inst in training
    assert out["refined_masks"].shape == (1, 1, 10, 64, 64)
    for k in ["loss_rec", "loss_lap", "loss_grad", "loss_max_atten"]:
        assert k in loss_dict, k
    assert "batch_stats" in mutated


def test_train_grads_flow(model_and_vars):
    model, variables = model_and_vars
    batch = _batch()

    def loss_fn(params):
        (out, loss_dict), _ = model.apply(
            {**variables, "params": params}, batch, train=True,
            use_mask_atten=False, use_gt_guidance=False, use_prm_weights=False,
            atten_loss_enabled=True,
            rngs={"unknown": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
            mutable=["batch_stats", "spectral"])
        return loss_dict["total"]

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])  # cacheable compile
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.5, f"only {nonzero}/{len(leaves)} grads nonzero"


def test_eval_instance_count_slices(model_and_vars):
    model, variables = model_and_vars
    batch = _batch(n_i=3, with_gt=False)
    out = model.apply(variables, batch, train=False)
    assert out["refined_masks"].shape == (1, 1, 3, 64, 64)


def test_s2d_stem_parity(model_and_vars):
    """encoder_args.s2d_stem lowers the 3x3/s2 stem conv onto the
    space-to-depth tensor (models/layers.py:SNConv.s2d) — same parameter tree,
    same outputs to float precision, in eval AND train mode."""
    model, variables = model_and_vars
    cfg = _image_cfg()
    cfg.model.encoder_args.s2d_stem = True
    model_s2d = build_model(cfg.model)
    batch = _batch()

    out_d = model.apply(variables, batch, train=False,
                        rngs={"unknown": jax.random.PRNGKey(3)})
    out_s = model_s2d.apply(variables, batch, train=False,
                            rngs={"unknown": jax.random.PRNGKey(3)})
    np.testing.assert_allclose(np.asarray(out_d["refined_masks"]),
                               np.asarray(out_s["refined_masks"]),
                               atol=1e-5, rtol=1e-5)

    rngs = {"unknown": jax.random.PRNGKey(4), "dropout": jax.random.PRNGKey(5)}
    kw = dict(train=True, update_sn=True, use_mask_atten=False,
              use_gt_guidance=True, use_prm_weights=True, atten_loss_enabled=True,
              rngs=rngs, mutable=["batch_stats", "spectral"])
    (out_d, loss_d), mut_d = model.apply(variables, batch, **kw)
    (out_s, loss_s), mut_s = model_s2d.apply(variables, batch, **kw)
    np.testing.assert_allclose(float(loss_d["total"]), float(loss_s["total"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_d["refined_masks"]),
                               np.asarray(out_s["refined_masks"]),
                               atol=1e-4, rtol=1e-4)
    d1 = jax.tree_util.tree_leaves(mut_d["batch_stats"])
    d2 = jax.tree_util.tree_leaves(mut_s["batch_stats"])
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

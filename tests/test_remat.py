"""Remat policies: selective (stage-tagged) remat must not change the math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maggie_tpu.engine.optim import build_optimizer
from maggie_tpu.engine.train_step import create_train_state, make_train_step
from maggie_tpu.models import build_model
from maggie_tpu.config import load_config


def _tiny_cfg():
    cfg = load_config()
    cfg.model.arch = "MaGGIe"
    cfg.model.encoder = "res_shortcut_embed_29"
    cfg.model.encoder_args.update(dict(num_embed=3, num_mask=10))
    cfg.model.decoder = "res_shortcut_inst_matt_spconv_22"
    cfg.model.decoder_args.update(dict(
        atten_block=1, atten_dim=32, atten_head=1, atten_stride=1,
        final_channel=32, max_inst=10, use_id_pe=True,
        sparse_mode="block", block_cap_frac=1.0))
    cfg.model.loss_atten_w = 1.0
    cfg.train.optimizer.name = "adamw"
    cfg.train.optimizer.lr = 1e-4
    cfg.train.scheduler.name = "cosine"
    cfg.train.max_iter = 100
    cfg.train.scheduler.warmup_iters = 10
    return cfg


def _batch(bs=1, h=64, w=64, n_i=2, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rs.rand(bs, 1, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray((rs.rand(bs, 1, n_i, h // 8, w // 8) > 0.6).astype(np.float32)),
        "alpha": jnp.asarray(rs.rand(bs, 1, n_i, h, w).astype(np.float32)),
        "transition": jnp.asarray((rs.rand(bs, 1, n_i, h, w) > 0.7).astype(np.float32)),
    }


def test_remat_matches_no_remat():
    # one test, three compiles: the "none" reference step is compiled ONCE and
    # both remat modes compare against it (the parametrized version recompiled
    # it per mode — the single most expensive redundancy in the suite)
    cfg = _tiny_cfg()
    model = build_model(cfg.model)
    tx, _ = build_optimizer(cfg)
    batch = _batch()
    kw = dict(use_mask_atten=False, use_gt_guidance=True,
              use_prm_weights=True, atten_loss_enabled=True)

    losses, params = {}, {}
    for remat in ("none", "full", "selective"):
        state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
        step = make_train_step(model, tx, remat=remat)
        state, ld = step(state, batch, jax.random.PRNGKey(1), **kw)
        losses[remat] = float(ld["total"])
        params[remat] = jax.device_get(state.params)

    for mode in ("full", "selective"):
        np.testing.assert_allclose(losses["none"], losses[mode], rtol=1e-5)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(a - b))), params["none"], params[mode])
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5, mode

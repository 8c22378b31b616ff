"""Block-sparse detail ladder vs the dense-masked oracle.

With capacity covering all blocks the two paths must agree exactly (same modules,
same math, patch halos replacing dense neighborhoods)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from maggie_tpu.config import load_config
from maggie_tpu.models import build_model
from maggie_tpu.ops.blocksparse import gather_patches, scatter_blocks, select_blocks


def test_select_gather_scatter_roundtrip():
    rs = np.random.RandomState(0)
    feat = jnp.asarray(rs.rand(2, 32, 48, 4).astype(np.float32))
    mask = np.zeros((2, 32, 48), np.float32)
    mask[0, 2:10, 3:12] = 1
    mask[1, 20:30, 30:40] = 1
    idx_n, idx_by, idx_bx, valid = select_blocks(jnp.asarray(mask), 16, cap=12)
    assert int(valid.sum()) >= 2
    patches = gather_patches(feat, idx_n, idx_by, idx_bx, 16, 2)
    assert patches.shape == (12, 20, 20, 4)
    out = scatter_blocks(patches[:, 2:18, 2:18], idx_n, idx_by, idx_bx, valid,
                         (2, 32, 48, 4), fill=0.0)
    # every selected block's core must be reproduced exactly
    sel = np.asarray(valid)
    for i in np.nonzero(sel)[0]:
        n, by, bx = int(idx_n[i]), int(idx_by[i]), int(idx_bx[i])
        np.testing.assert_allclose(
            np.asarray(out)[n, by * 16:(by + 1) * 16, bx * 16:(bx + 1) * 16],
            np.asarray(feat)[n, by * 16:(by + 1) * 16, bx * 16:(bx + 1) * 16])


def _cfg(sparse_mode, cap_frac=1.0):
    cfg = load_config("configs/maggie_image.yaml")
    cfg.model.decoder_args.update(dict(
        atten_dim=32, final_channel=32, max_inst=3, sparse_mode=sparse_mode,
        block_cap_frac=cap_frac))
    cfg.model.encoder_args.num_mask = 3
    return cfg


def _blob_batch(h=128, w=192, n_i=2):
    yy, xx = np.mgrid[0:h, 0:w]
    alphas = []
    for j in range(n_i):
        d = np.sqrt((yy - h / 2) ** 2 + (xx - (50 + 80 * j)) ** 2)
        alphas.append(np.clip((30 - d) / 10, 0, 1))
    alpha = np.stack(alphas)[None, None]  # (1,1,n_i,h,w)
    rs = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rs.rand(1, 1, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray((alpha > 0.5).astype(np.float32)[:, :, :, ::8, ::8].copy()),
    }


def test_block_matches_oracle_at_full_capacity():
    batch = _blob_batch()
    cfg_o = _cfg("oracle")
    model_o = build_model(cfg_o.model)
    variables = model_o.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out_o = model_o.apply(variables, batch, train=False)

    cfg_b = _cfg("block", cap_frac=1.0)
    cfg_b.model.decoder_args.phase_rung = False
    model_b = build_model(cfg_b.model)
    out_b = model_b.apply(variables, batch, train=False)

    for k in ("alpha_os4", "alpha_os1", "refined_masks"):
        np.testing.assert_allclose(np.asarray(out_b[k]), np.asarray(out_o[k]),
                                   atol=2e-5, rtol=1e-4), k

    # Phase-space rung 3 (ops/phase.py): same math with a reassociated f32
    # summation order. Random-init activations reach O(400) here, so per-element
    # drift is ~3e-5 RELATIVE — up to ~1e-3 absolute on a handful of alphas.
    # Trained/real-scale activations sit at O(1); the exactness of the
    # rearrangement itself is asserted tap-by-tap in tests/test_phase.py.
    cfg_p = _cfg("block", cap_frac=1.0)
    cfg_p.model.decoder_args.phase_rung = True
    model_p = build_model(cfg_p.model)
    out_p = model_p.apply(variables, batch, train=False)
    for k in ("alpha_os4", "alpha_os1", "refined_masks"):
        d = np.abs(np.asarray(out_p[k]) - np.asarray(out_o[k]))
        assert d.max() < 2e-3, (k, d.max())
        assert d.mean() < 1e-5, (k, d.mean())


def test_lazy_os2_shortcut_bit_exact():
    """``encoder_args.lazy_os2_shortcut`` defers the two 288x512x32 shortcut_1
    convs to gathered 36x36 patch windows in the ladder's rung 2. It is OFF by
    default — the round-5 same-session A/B measured it 31% slower on v5e
    (models/maggie.py) — but the transform must stay bit-exact: the gathered
    window [2:38] after two same-pad 3x3 convs is the exactly-valid interior,
    with the inner mask restoring dense zero-padding semantics at image borders."""
    batch = _blob_batch()
    outs = {}
    for lazy in (False, True):
        cfg = _cfg("block", cap_frac=1.0)
        cfg.model.encoder_args.lazy_os2_shortcut = lazy
        model = build_model(cfg.model)
        if not outs:
            variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                                   train=False)
        outs[lazy] = model.apply(variables, batch, train=False)["refined_masks"]
    assert float(jnp.max(jnp.abs(outs[True] - outs[False]))) == 0.0


@pytest.mark.slow
def test_block_matches_oracle_in_train_mode():
    """Train-mode block sparsity: loss, gradients and the mutated (global,
    core-windowed) BN statistics must equal the dense oracle when capacity covers
    every active block. inst_spec dropout is disabled — its mask shapes differ
    between the dense map and the gathered patch stack, everything else is
    deterministic given the same rngs."""
    import optax
    from maggie_tpu.engine.train_step import create_train_state, make_train_step

    h, w, n_i = 128, 192, 2
    batch = _blob_batch(h, w, n_i)
    rs = np.random.RandomState(1)
    alpha = rs.rand(1, 1, n_i, h, w).astype(np.float32)
    batch["alpha"] = jnp.asarray(alpha)
    batch["transition"] = jnp.asarray((rs.rand(1, 1, n_i, h, w) > 0.7).astype(np.float32))

    results = {}
    for mode in ("oracle", "block"):
        cfg = _cfg(mode, cap_frac=1.0)
        cfg.model.decoder_args.update(dict(inst_spec_dropout=0.0,
                                           warmup_mask_atten_iter=0,
                                           warmup_detail_iter=0))
        model = build_model(cfg.model)
        tx = optax.sgd(0.01)
        state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
        step = make_train_step(model, tx)
        state, loss = step(state, batch, jax.random.PRNGKey(3),
                           use_mask_atten=False, use_gt_guidance=False,
                           use_prm_weights=True, atten_loss_enabled=True)
        results[mode] = (float(loss["total"]), state)

    lo, so = results["oracle"]
    lb, sb = results["block"]
    np.testing.assert_allclose(lb, lo, rtol=1e-4, atol=1e-5)
    # updated params (grads through gathers/scatters) and BN stats match
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(so.params), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(sb.params), key=str)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5, err_msg=str(ka))
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(so.batch_stats), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(sb.batch_stats), key=str)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5, err_msg=str(ka))


def test_block_low_capacity_degrades_gracefully():
    batch = _blob_batch()
    cfg_b = _cfg("block", cap_frac=0.05)
    model_b = build_model(cfg_b.model)
    variables = model_b.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model_b.apply(variables, batch, train=False)
    a = np.asarray(out["refined_masks"])
    assert np.isfinite(a).all() and a.min() >= 0 and a.max() <= 1

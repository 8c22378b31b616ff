"""Multi-device correctness on the 8-virtual-CPU mesh (conftest provisions it).

The reference's only distribution mode is DDP data parallelism
(``/root/reference/tools/main.py:41-42``, ``engine/train.py:163-164``); its SyncBN
all-reduces BN statistics (``engine/train.py:160-161``). The TPU equivalents under
test here:

- 1D ``data`` mesh: a jitted train step on a batch sharded via ``shard_batch`` must
  produce the SAME loss/params as the same step on one device (DDP equivalence —
  XLA's inserted psum subsumes DDP's gradient all-reduce, and the global BN batch
  statistics subsume SyncBN);
- 2D ``data x space`` mesh (``shard_batch_2d``): image rows sharded over 'space',
  GSPMD inserting conv halo exchanges — must match the 1-device result too;
- mesh-sharded eval forward equals the unsharded forward;
- ``Metric.gather_metric`` is a no-op single-process and keeps score/count.

The model is a small SNConv+BN+conv stack speaking the MaGGIe train-step protocol
(batch dict, static flags, 'unknown'/'dropout' rngs, mutable batch_stats/spectral)
so the REAL ``make_train_step``/``TrainState``/mesh helpers are exercised without
the full model's multi-minute 1-core compile (the driver's ``dryrun_multichip``
covers the full model).
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax
import pytest

from maggie_tpu.engine.train_step import create_train_state, make_train_step
from maggie_tpu.models.layers import BatchNorm, SNConv
from maggie_tpu.parallel import create_mesh, replicate, shard_batch
from maggie_tpu.parallel.mesh import create_mesh_2d, shard_batch_2d


class TinyMatte(nn.Module):
    """Minimal model with the MaGGIe interface: SNConv (spectral collection),
    BatchNorm (batch_stats, global under a sharded batch), conv head, L1 loss."""

    @nn.compact
    def __call__(self, batch, train=False, update_sn=False, **kwargs):
        x = batch["image"]  # (b, n_f, H, W, 3)
        b, n_f, h, w, _ = x.shape
        z = x.reshape(b * n_f, h, w, 3)
        z = SNConv(16, (3, 3), (1, 1), (1, 1), name="conv1")(z, update_sn)
        z = BatchNorm(name="bn1")(z, train)
        z = nn.relu(z)
        z = SNConv(16, (3, 3), (1, 1), (1, 1), name="conv2")(z, update_sn)
        z = BatchNorm(name="bn2")(z, train)
        z = nn.relu(z)
        n_i = batch["alpha"].shape[2] if "alpha" in batch else 1
        logits = nn.Conv(n_i, (3, 3), padding=1, name="head")(z)
        pred = (jnp.tanh(logits) + 1.0) / 2.0
        pred = jnp.transpose(pred, (0, 3, 1, 2)).reshape(b, n_f, n_i, h, w)
        out = {"refined_masks": pred}
        if train:
            loss = jnp.mean(jnp.abs(pred - batch["alpha"]))
            return out, {"total": loss}
        return out


def _batch(b=8, n_f=1, n_i=2, h=16, w=16, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rs.rand(b, n_f, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray((rs.rand(b, n_f, n_i, h // 8, w // 8) > 0.5).astype(np.float32)),
        "alpha": jnp.asarray(rs.rand(b, n_f, n_i, h, w).astype(np.float32)),
        "transition": jnp.asarray((rs.rand(b, n_f, n_i, h, w) > 0.7).astype(np.float32)),
    }


def _one_step(batch, mesh=None, two_d=False):
    model = TinyMatte()
    tx = optax.sgd(0.1)
    state = create_train_state(
        model, tx, jax.tree_util.tree_map(lambda x: x[:1], batch), jax.random.PRNGKey(0))
    if mesh is not None:
        state = replicate(state, mesh)
        batch = shard_batch_2d(batch, mesh) if two_d else shard_batch(batch, mesh)
    step = make_train_step(model, tx)
    state, loss = step(state, batch, jax.random.PRNGKey(1),
                       use_mask_atten=False, use_gt_guidance=False,
                       use_prm_weights=True, atten_loss_enabled=False)
    return state, float(loss["total"])


def test_dp8_matches_single_device():
    """DDP equivalence: 8-way dp == 1 device, same global batch (loss AND params)."""
    batch = _batch()
    s1, l1 = _one_step(batch)
    mesh = create_mesh(8)
    s8, l8 = _one_step(batch, mesh)
    assert np.isfinite(l1)
    np.testing.assert_allclose(l1, l8, rtol=1e-6, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    # global BN stats under the sharded batch == single-device stats (SyncBN parity)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_mesh2d_matches_single_device():
    """dp=4 x sp=2 (H sharded over 'space', halo exchange by GSPMD) == 1 device."""
    batch = _batch()
    s1, l1 = _one_step(batch)
    mesh = create_mesh_2d(4, 2)
    s2, l2 = _one_step(batch, mesh, two_d=True)
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_shard_batch_2d_specs():
    """shard_batch_2d puts image H on 'space' and batch on 'data' (a wrong spec
    would change shard shapes and fail here)."""
    mesh = create_mesh_2d(4, 2)
    batch = shard_batch_2d(_batch(), mesh)
    img = batch["image"]
    shard_shapes = {s.data.shape for s in img.addressable_shards}
    assert shard_shapes == {(2, 1, 8, 16, 3)}  # b/4, H/2
    alpha_shards = {s.data.shape for s in batch["alpha"].addressable_shards}
    assert alpha_shards == {(2, 1, 2, 8, 16)}  # (b/4, n_f, n_i, H/2, W)


def test_sharded_eval_matches_unsharded():
    batch = _batch()
    model = TinyMatte()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    ref = jax.jit(lambda v, b: model.apply(v, b, train=False)["refined_masks"])(
        variables, batch)
    mesh = create_mesh(8)
    vs = replicate(variables, mesh)
    bs = shard_batch(batch, mesh)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False)["refined_masks"])(vs, bs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-6, atol=1e-6)


def test_gather_metric_single_process():
    from maggie_tpu.utils.metrics import MAD
    m = MAD()
    pred = np.random.RandomState(0).rand(1, 8, 8).astype(np.float32)
    gt = np.zeros((1, 8, 8), np.float32)
    m.update(pred, gt)
    score, count = m.score, m.count
    m.gather_metric()  # single-process: must be a no-op
    assert (m.score, m.count) == (score, count)
    assert jax.process_count() == 1

"""Device mesh + sharding helpers.

The reference's distribution story is data parallelism via one-process-per-GPU DDP
over NCCL (``tools/main.py:41-42``, ``engine/train.py:163-164``). The TPU-native
equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis: the batch is sharded over
it, parameters are replicated, and XLA inserts the gradient/BN-stat collectives over
ICI during jit compilation (subsuming DDP's all-reduce and SyncBN). No launcher is
required: a single process drives all local devices.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    mesh_devices = mesh_utils.create_device_mesh((n,), devices=devices[:n])
    return Mesh(mesh_devices, (axis_name,))


def create_mesh_2d(dp: int, sp: int, axis_names: tuple[str, str] = ("data", "space")) -> Mesh:
    """2D mesh: batch over ``data``, image rows over ``space``. GSPMD inserts the
    conv halo exchanges over ICI automatically for H-sharded activations — the
    TPU-native path to scaling high-resolution frames beyond one chip's HBM."""
    devices = jax.devices()
    assert dp * sp <= len(devices), (dp, sp, len(devices))
    mesh_devices = mesh_utils.create_device_mesh((dp, sp), devices=devices[: dp * sp])
    return Mesh(mesh_devices, axis_names)


def shard_batch_2d(batch: dict, mesh: Mesh) -> dict:
    """Shard batch dim over 'data' and the image H dim over 'space'.

    Maps layouts: image (b, n_f, H, W, 3) -> P('data', None, 'space');
    mask/alpha/transition (b, n_f, n_i, H, W) -> P('data', None, None, 'space').
    """
    def put(k, x):
        if x.ndim == 5 and k == "image":
            spec = P("data", None, "space")
        elif x.ndim == 5:
            spec = P("data", None, None, "space")
        else:
            spec = P("data")
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(k, v) for k, v in batch.items()}


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch dict on the mesh, sharded over the leading (batch) dim."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# ---------------------------------------------------------------- multiprocess
# The reference's DDP spans OS processes (one per GPU, torchrun); its gradient
# all-reduce crosses process boundaries over NCCL (engine/train.py:163-164).
# The TPU equivalent: a mesh over ALL global devices (jax.devices() is global
# after jax.distributed.initialize), with each process contributing its local
# batch shard. XLA then inserts the cross-process grad/BN collectives exactly
# as it does intra-process — same train step, same code path.

def shard_batch_global(local_batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Multi-process batch placement: each process passes its LOCAL shard of the
    batch (the loader's per-process shard); returns global arrays whose leading
    dim is the GLOBAL batch, sharded over ``axis_name``. Single-process this
    degenerates to ``shard_batch`` semantics."""
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, P(axis_name)), local_batch)


def replicate_global(tree: Any, mesh: Mesh) -> Any:
    """Multi-process replication: every process passes the SAME host value (e.g.
    a seeded-identically initialized train state); returns globally replicated
    arrays usable by a jitted step over the global mesh."""
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(x, mesh, P()),
        tree)

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

"""Test configuration: force an 8-virtual-device CPU platform before JAX init.

Multi-device sharding paths are exercised on a virtual CPU mesh per SURVEY.md §4;
real TPU runs happen via bench.py / the driver. The environment may pin
``JAX_PLATFORMS=axon`` (a tunneled TPU plugin); tests must override it hard, both in
the env and in jax.config, or every test pays a ~40s remote compile.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"

# Persistent compile cache: the expensive part of this suite is XLA compilation of
# full-model fwd/bwd graphs on a 1-core host (~4 min for the train-mode parity
# test alone). Cached compiles make reruns take seconds.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

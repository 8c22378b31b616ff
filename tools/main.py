"""CLI entry (reference ``tools/main.py:17-140``), launcher-free.

Usage:
    python tools/main.py --config configs/maggie_image.yaml [--eval-only]
        [--precision 16|32] [dotted.key value ...]

A single process drives all local TPU devices (no torchrun equivalent needed —
the data mesh subsumes DDP, SURVEY.md §2.9).
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from maggie_tpu.config import load_config  # noqa: E402


def setup_logging(cfg, eval_only: bool) -> None:
    import jax
    rank = jax.process_index()
    os.makedirs(cfg.output_dir, exist_ok=True)
    prefix = "test-log" if eval_only else "log"
    handlers = [logging.FileHandler(os.path.join(cfg.output_dir, f"{prefix}_rank{rank}.log"))]
    if rank == 0 or os.environ.get("LOG_ALL"):
        handlers.append(logging.StreamHandler())
    level = logging.DEBUG if os.environ.get("DEBUG") else logging.INFO
    logging.basicConfig(level=level, handlers=handlers,
                        format="%(asctime)s %(levelname)s %(name)s: %(message)s", force=True)


def main() -> None:
    parser = argparse.ArgumentParser("maggie_tpu")
    parser.add_argument("--config", required=True)
    parser.add_argument("--precision", type=int, default=32, choices=[16, 32])
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--sweep-job", action="store_true",
                        help="wandb sweep job: the agent already called wandb.init "
                             "(reference tools/main.py:96)")
    parser.add_argument("--profile", default="", metavar="DIR",
                        help="capture a jax.profiler trace of the run into DIR")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    # honor JAX_PLATFORMS even when the plugin registry would override it
    # (jax.config.update must run before backend init; see tests/conftest.py)
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "," not in plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    cfg = load_config(args.config, args.opts or [])
    if args.precision == 16:
        cfg.model.precision = "bf16"

    cfg.output_dir = os.path.join(cfg.output_dir, cfg.name)
    setup_logging(cfg, args.eval_only)
    # echo the merged config into the log (reference tools/main.py:38) — the
    # eval sweep's results.csv extraction reads split/mask_dir_name from here
    logging.info("Config:\n" + cfg.dump())

    # seeding (reference tools/main.py:131-137); JAX kernels take explicit keys,
    # these cover host-side numpy/python randomness
    seed = cfg.train.seed if cfg.train.seed >= 0 else 2023
    random.seed(seed)
    np.random.seed(seed)

    # persistent compile cache: tunnel compiles are expensive
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import contextlib
    prof_ctx = contextlib.nullcontext()
    if args.profile:
        # SURVEY.md §5: tracing/profiling hooks (the reference has none; it logs
        # AverageMeter timings only). May be unsupported on tunneled dev platforms.
        try:
            prof_ctx = jax.profiler.trace(args.profile)
        except Exception as exc:
            logging.warning(f"profiler unavailable: {exc}")

    with prof_ctx:
        if not args.eval_only:
            with open(os.path.join(cfg.output_dir, "config.yaml"), "w") as f:
                f.write(cfg.dump())
            from maggie_tpu.engine.train import train
            train(cfg, is_sweep=args.sweep_job)
        else:
            from maggie_tpu.engine.test import test
            test(cfg)


if __name__ == "__main__":
    main()

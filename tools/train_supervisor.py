#!/usr/bin/env python
"""Elastic training supervisor: restart-on-failure around ``tools/main.py``.

The reference has no failure handling at all (SURVEY §5: recovery = a human
re-running with ``train.resume_last True``). On TPU that is not optional —
preemptions and transient tunnel/runtime faults (``jax.errors.JaxRuntimeError:
UNAVAILABLE``) kill long runs routinely. This supervisor makes recovery a
process-level loop:

  1. launch ``tools/main.py --config ... [opts]`` as a child process;
  2. on a non-zero exit, wait an exponential backoff, then relaunch with
     ``train.resume_last True`` appended IF ``<output_dir>/last_state`` exists
     (so a crash before the first checkpoint restarts fresh);
  3. stop on exit 0 (run finished), on ``--max-restarts`` exhausted, or on a
     crash before any NEW progress was checkpointed twice in a row (a crash
     loop, e.g. a genuine bug rather than a transient fault).

Pair with ``cfg.train.ckpt_iter N`` (engine/train.py) so the checkpoint
cadence bounds lost work to N iterations independent of ``val_iter``.

Usage:
    python tools/train_supervisor.py --config configs/maggie_image.yaml \
        --max-restarts 20 -- train.ckpt_iter 100 output_dir /tmp/run

Everything after ``--`` is forwarded to tools/main.py verbatim.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def _ckpt_step(output_dir: str) -> int:
    """Read the checkpointed step from <output_dir>, -1 if no checkpoint exists.

    ``engine/train.py:save_last`` writes a ``last_step.txt`` sidecar next to the
    orbax ``last_state`` directory exactly for this (orbax internals are opaque).
    """
    last = os.path.join(output_dir, "last_state")
    if not os.path.isdir(last):
        return -1
    try:
        with open(os.path.join(output_dir, "last_step.txt")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return 0  # checkpoint exists but no sidecar (older run): resumable, step unknown


def _backend_alive(timeout_s: float = 120.0) -> bool:
    """True when the jax backend is reachable, probed in a killable child
    (initializing against a dead TPU tunnel hangs forever — bench.py has the
    same guard). Test hook: MAGGIE_SUPERVISOR_PROBE is a shell command whose
    exit status substitutes for the probe."""
    hook = os.environ.get("MAGGIE_SUPERVISOR_PROBE")
    try:
        if hook:
            return subprocess.call(hook, shell=True, timeout=timeout_s) == 0
        return subprocess.call(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=timeout_s, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL) == 0
    except subprocess.TimeoutExpired:
        return False


def run(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    parser.add_argument("--config", required=True)
    parser.add_argument("--max-restarts", type=int, default=20)
    parser.add_argument("--backoff", type=float, default=5.0,
                        help="initial restart delay (s); doubles per consecutive "
                             "no-progress failure, capped at 300 s")
    parser.add_argument("--python", default=sys.executable)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="dotted config overrides forwarded to tools/main.py")
    args = parser.parse_args(argv)
    opts = [o for o in args.opts if o != "--"]

    # test hook: substitute the trainer entrypoint (tests/test_supervisor.py)
    main_py = os.environ.get("MAGGIE_SUPERVISOR_MAIN") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "main.py")
    # resolve the EFFECTIVE run dir exactly as tools/main.py does
    # (cfg.output_dir = join(cfg.output_dir, cfg.name), main.py:63)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from maggie_tpu.config import load_config
    cfg = load_config(args.config, opts)
    output_dir = os.path.join(cfg.output_dir, cfg.name)

    restarts = 0
    no_progress_streak = 0
    delay = args.backoff
    while True:
        # A dead backend is an OUTAGE, not a crash loop: wait it out before
        # launching, without burning restarts or the no-progress streak. Only
        # crashes that happen while the backend is reachable count.
        waited = 0.0
        interval = float(os.environ.get("MAGGIE_SUPERVISOR_PROBE_INTERVAL", 60))
        while not _backend_alive():
            no_progress_streak = 0
            waited += interval
            print(f"[supervisor] backend unreachable (waited {waited:.0f}s); "
                  f"probing again in {interval:.0f}s", flush=True)
            time.sleep(interval)
        resume = ["train.resume_last", "True"] if _ckpt_step(output_dir) >= 0 else []
        cmd = [args.python, main_py, "--config", args.config, *opts, *resume]
        step_before = _ckpt_step(output_dir)
        print(f"[supervisor] launch #{restarts}: {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd)
        if rc == 0:
            print("[supervisor] training finished cleanly", flush=True)
            return 0
        step_after = _ckpt_step(output_dir)
        progressed = step_after > step_before
        no_progress_streak = 0 if progressed else no_progress_streak + 1
        print(f"[supervisor] child exited rc={rc} (ckpt step {step_before} -> "
              f"{step_after}, progress={progressed})", flush=True)
        if no_progress_streak >= 3:
            print("[supervisor] 3 consecutive failures with no checkpoint progress"
                  " — treating as a crash loop, giving up", flush=True)
            return rc
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[supervisor] exceeded --max-restarts={args.max_restarts}", flush=True)
            return rc
        wait = min(delay * (2 ** (no_progress_streak)), 300.0) if not progressed else args.backoff
        print(f"[supervisor] restarting in {wait:.0f}s", flush=True)
        time.sleep(wait)


if __name__ == "__main__":
    sys.exit(run())

"""Benchmark: MaGGIe image eval forward throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Condition mirrors the reference's eval setup (BASELINE.md): short side 576 padded to
x64 (576x1024 here), batch 1, multi-instance (3), REALISTIC blob instances (so the
uncertainty band — and hence the block-sparse detail ladder — sees representative
sparsity rather than an all-unknown random field), bf16 activations (the TPU
analogue of the reference's headline AMP fp16 eval, --precision 16; random-weight
alpha drift vs f32 is 6.3e-4 mean, within the 1e-3 MAD budget).

The reference publishes no throughput numbers (SURVEY.md §6, BASELINE.md), so
vs_baseline is reported against this framework's recorded ROUND-1 measurement on
the same chip/shape (17.40 frames/s, f32, block cap 0.5) — a real recorded
baseline rather than a pretend torch number. Because that baseline is f32, a
same-methodology f32 companion number is measured in the same run and printed to
stderr, so the bf16-vs-f32 and methodology components of the headline are
separable (advisor round-2 finding). Dispatch overhead is calibrated by timing an
empty jitted scalar function the same way, not assumed.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

ROUND1_BASELINE_FPS = 17.40  # BENCH_r01.json, same chip/shape/condition (f32)

# Sidecar record of the last REAL measurement this script made on the chip.
# Written by every successful run, read ONLY as a clearly-flagged stale
# fallback when the shared TPU tunnel is down for the whole probe budget at
# bench time — the tunnel has multi-hour outages (see docs/DESIGN.md) and a
# missing number would erase a real measurement. No hand-edited constants.
SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "output", "bench_last.json")


def _blob_batch(h, w, n_i, seed=0):
    import jax.numpy as jnp
    yy, xx = np.mgrid[0:h, 0:w]
    rs = np.random.RandomState(seed)
    alphas = []
    for j in range(n_i):
        cx = (j + 1) * w // (n_i + 1)
        cy = h // 2 + rs.randint(-h // 8, h // 8)
        r = h // 4
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        alphas.append(np.clip((r - d) / (r * 0.2), 0, 1))
    alpha = np.stack(alphas).astype(np.float32)
    masks = (alpha > 0.5).astype(np.float32)[:, ::8, ::8]
    return {
        "image": jnp.asarray(rs.rand(1, 1, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray(masks[None, None]),
    }


def _probe_backend(timeout_s: int = 120, total_budget_s: int = 900) -> None:
    """Probe the backend in a killable child (initializing against a dead
    tunnel hangs the parent forever). The shared TPU tunnel has transient
    outages measured in minutes, so retry probes up to ``total_budget_s``
    (override: BENCH_PROBE_BUDGET_S) before giving up — a benchmark run that
    waits out a blip is better than one that reports nothing."""
    import subprocess
    import sys
    import time
    budget = float(os.environ.get("BENCH_PROBE_BUDGET_S", total_budget_s))
    deadline = time.time() + budget
    attempt = 0
    while True:
        attempt += 1
        try:
            probe_t = max(15.0, min(timeout_s, deadline - time.time()))
            subprocess.run([sys.executable, "-c", "import jax; assert jax.devices()"],
                           timeout=probe_t, check=True, capture_output=True)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as exc:
            if time.time() + 30 >= deadline:
                raise BackendUnreachable(
                    f"bench: jax backend unreachable after {attempt} probes over "
                    f"{budget:.0f}s (TPU tunnel down?): {type(exc).__name__}") from exc
            print(f"bench: backend probe {attempt} failed ({type(exc).__name__}); "
                  f"retrying...", file=sys.stderr)
            time.sleep(30)


class BackendUnreachable(RuntimeError):
    pass


def main():
    import sys as _sys
    try:
        _probe_backend()
    except BackendUnreachable as exc:
        # Honest stale fallback: re-emit the sidecar written by the last real
        # run; "stale" marks that THIS run could not re-measure it. An A/B
        # run (BENCH_OVERRIDES) measures a DIFFERENT configuration — re-
        # emitting the headline sidecar under it would mislabel the result.
        if os.environ.get("BENCH_OVERRIDES"):
            raise SystemExit(
                f"{exc}; BENCH_OVERRIDES is set "
                f"({os.environ['BENCH_OVERRIDES']!r}) and the sidecar records "
                f"the headline configuration, not this one — no fallback")
        try:
            with open(SIDECAR) as f:
                last = json.load(f)
        except (OSError, ValueError):
            raise SystemExit(f"{exc}; and no sidecar {SIDECAR} to fall back to")
        print(f"{exc}; emitting last real measurement as stale", file=_sys.stderr)
        print(json.dumps({
            "metric": "maggie_image_eval_576p_3inst_frames_per_sec_per_chip",
            "value": last["value"],
            "unit": "frames/sec/chip",
            "vs_baseline": round(last["value"] / ROUND1_BASELINE_FPS, 4),
            "stale": True,
            "note": "TPU tunnel down for the whole probe budget at bench time; "
                    "value is this script's last real-chip measurement "
                    f"({last.get('measured_at', 'unknown date')})",
        }))
        return
    import jax
    import jax.numpy as jnp

    # persistent compile cache: tunnel compiles cost 40s+ per shape
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from maggie_tpu.models import build_model
    from __graft_entry__ import _image_model_cfg, _make_batch

    import sys

    from maggie_tpu.utils.checkpoint import fold_spectral_norm

    h, w, n_i = 576, 1024, 3
    batch = _blob_batch(h, w, n_i)

    # Iterations loop INSIDE jit (lax.scan with a serial data dependency): the
    # tunneled dev platform costs ~3 ms dispatch per jit call and its
    # block_until_ready does not block, so a host-side loop would overstate
    # per-frame time by ~20% at current speeds. One dispatch + scalar D2H syncs
    # the whole run; reported time is device time per frame. 100 iterations
    # keep the separately-measured dispatch correction at ~3% of the window
    # (at 20 it was ~16%, giving the calibration too much leverage).
    iters = int(os.environ.get("BENCH_ITERS", 100))

    # measured empty-dispatch calibration (same call/sync pattern, no compute)
    empty = jax.jit(lambda c: c + 1.0)
    float(empty(jnp.float32(0.0)))
    dispatch = min(_timed(lambda: float(empty(jnp.float32(0.0)))) for _ in range(5))

    def measure(precision, n_windows):
        """Run ``n_windows`` repeated ``iters``-frame scan windows and return
        the per-window dispatch-corrected f/s list. The HEADLINE is the
        MEDIAN window (robust to shared-tunnel noise, which has measured
        ~11% session spread — docs/DESIGN.md); min/max are reported so any
        future A/B can be judged against the same-session spread."""
        from __graft_entry__ import _init_variables
        cfg = _image_model_cfg()
        cfg.model.precision = precision
        cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
        # ad-hoc A/B knobs without editing this file, e.g.
        #   BENCH_OVERRIDES="model.encoder_args.s2d_stem true" python bench.py
        if os.environ.get("BENCH_OVERRIDES"):
            cfg.merge_from_list(os.environ["BENCH_OVERRIDES"].split())
        model = build_model(cfg.model)
        # init at 64x64 (param shapes are resolution-independent): a full-res
        # init graph costs minutes of tunnel compile vs seconds for the tiny one
        variables = _init_variables(model, n_i=3)
        variables = fold_spectral_norm(variables)

        def run(v, b, carry):
            def body(c, _):
                bb = dict(b)
                bb["image"] = b["image"] + c * 0.0
                out = model.apply(v, bb, train=False)["refined_masks"]
                return jnp.sum(out) * 1e-20 + c, ()
            final, _ = jax.lax.scan(body, carry, None, length=iters)
            return final

        fwd = jax.jit(run)
        float(fwd(variables, batch, jnp.float32(0.0)))  # compile + warmup + sync
        windows = [_timed(lambda: float(fwd(variables, batch, jnp.float32(0.0))))
                   for _ in range(n_windows)]
        fps_w = sorted(iters / (t - dispatch) for t in windows)
        med = float(np.median(fps_w))
        print(f"[bench] {precision}: {n_windows} windows x {iters} frames, "
              f"dispatch-corrected median {med:.2f} f/s "
              f"(min {fps_w[0]:.2f} / max {fps_w[-1]:.2f}, "
              f"spread {100 * (fps_w[-1] - fps_w[0]) / med:.1f}%)", file=sys.stderr)
        return med, fps_w

    n_windows = int(os.environ.get("BENCH_WINDOWS", 5))
    fps32, fps32_w = measure("fp32", max(3, n_windows - 2))
    print(f"[bench] f32 companion (same methodology): {fps32:.2f} frames/s; "
          f"dispatch calibration {dispatch * 1e3:.2f} ms "
          f"({100.0 * dispatch / (iters / fps32 + dispatch):.1f}% of the f32 window)",
          file=sys.stderr)
    fps, fps_w = measure("bf16", n_windows)
    result = {
        "metric": "maggie_image_eval_576p_3inst_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / ROUND1_BASELINE_FPS, 4),
        "windows": [round(x, 2) for x in fps_w],
    }
    # sidecar: record this real measurement for the stale fallback path —
    # but only for the headline condition (a BENCH_OVERRIDES A/B run measures a
    # different configuration and must not masquerade as the headline)
    if not os.environ.get("BENCH_OVERRIDES"):
        try:
            os.makedirs(os.path.dirname(SIDECAR), exist_ok=True)
            with open(SIDECAR, "w") as f:
                json.dump({**result, "f32_companion": round(fps32, 4),
                           "f32_windows": [round(x, 2) for x in fps32_w],
                           "dispatch_ms": round(dispatch * 1e3, 2), "iters": iters,
                           "measured_at": time.strftime("%Y-%m-%d %H:%M:%S")}, f)
        except OSError as e:
            print(f"[bench] WARNING: could not write sidecar {SIDECAR}: {e}",
                  file=sys.stderr)
    print(json.dumps(result))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()

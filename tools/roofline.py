"""Bytes-accessed roofline for the bench-condition eval frame and train step.

VERDICT r4 weak-5: the "~4-4.5 ms/frame floor" was a trace-sum extrapolation;
"speed of light" needs a falsifiable bound. XLA's compiled cost analysis
yields total FLOPs and total HBM bytes accessed for the OPTIMIZED (post-
fusion) module; dividing by the chip's peak gives two hard floors:

    bw_floor_ms    = bytes_accessed / HBM_BW
    flops_floor_ms = flops / PEAK_FLOPS
    floor_ms       = max(bw_floor_ms, flops_floor_ms)

v5e (TPU v5 lite) peaks: 197 TFLOP/s bf16 (394 int8), 819 GB/s HBM — public
spec-sheet numbers (the same 197 used by docs/DESIGN.md's MFU accounting).

Caveats, stated so the number is read correctly: ``bytes accessed`` is XLA's
static estimate of operand+output HBM traffic per fused computation. It does
not model VMEM-resident reuse beyond fusion boundaries (over-counts a floor)
nor DMA inefficiency from strided/tile-misaligned access (under-counts real
traffic); it is a lower bound on achievable time for THIS op decomposition,
not for the algorithm in the abstract.

Usage: python tools/roofline.py [eval|train|both]   (default both)
Writes output/roofline.json and prints one line per graph.
"""

import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np

HBM_BW = 819e9          # v5e HBM bandwidth, bytes/s
PEAK_BF16 = 197e12      # v5e bf16 FLOP/s
PEAK_F32 = PEAK_BF16 / 2


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax: one dict per device
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _report(name, flops, byts, peak_flops, per=1):
    flops, byts = flops / per, byts / per
    bw_ms = byts / HBM_BW * 1e3
    fl_ms = flops / peak_flops * 1e3
    floor = max(bw_ms, fl_ms)
    bound = "bandwidth" if bw_ms >= fl_ms else "compute"
    print(f"[roofline] {name}: {flops / 1e9:.2f} GFLOP, "
          f"{byts / 1e6:.1f} MB accessed -> bw floor {bw_ms:.2f} ms, "
          f"flops floor {fl_ms:.2f} ms => floor {floor:.2f} ms ({bound}-bound)")
    return {"name": name, "gflop": round(flops / 1e9, 3),
            "mbytes_accessed": round(byts / 1e6, 2),
            "bw_floor_ms": round(bw_ms, 3), "flops_floor_ms": round(fl_ms, 3),
            "floor_ms": round(floor, 3), "bound": bound}


def eval_entry():
    import jax
    from __graft_entry__ import _image_model_cfg, _init_variables
    from bench import _blob_batch
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import fold_spectral_norm

    cfg = _image_model_cfg()
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    if os.environ.get("BENCH_OVERRIDES"):
        cfg.merge_from_list(os.environ["BENCH_OVERRIDES"].split())
    model = build_model(cfg.model)
    batch = _blob_batch(576, 1024, 3)
    variables = fold_spectral_norm(_init_variables(model, n_i=3))
    fn = jax.jit(lambda v, b: model.apply(v, b, train=False)["refined_masks"])
    compiled = fn.lower(variables, batch).compile()
    flops, byts = _cost(compiled)
    return _report("eval_frame_576p_3inst_bf16_block0.5", flops, byts, PEAK_BF16)


def train_entry():
    import jax
    from __graft_entry__ import _image_model_cfg, _make_batch
    from maggie_tpu.engine.optim import build_optimizer
    from maggie_tpu.engine.train_step import create_train_state, make_train_step
    from maggie_tpu.models import build_model

    cfg = _image_model_cfg()
    cfg.model.precision = "bf16"
    # the envelope condition (docs/DESIGN.md): bs6, selective remat, BLOCK
    # ladder cap 0.5 — the dense oracle ladder at bs6/512^2 exceeds HBM
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    cfg.train.optimizer.name = "adamw"
    cfg.train.optimizer.lr = 1.5e-4
    model = build_model(cfg.model)
    tx, _ = build_optimizer(cfg)
    bs = int(os.environ.get("ROOFLINE_TRAIN_BS", 6))
    batch = _make_batch(bs, 1, 10, 512, 512, with_gt=True)
    state = create_train_state(model, tx,
                               jax.tree_util.tree_map(lambda x: x[:1], batch),
                               jax.random.PRNGKey(0))
    step = make_train_step(model, tx, remat="selective")
    # same static-flag combination as the bs6 envelope row (tools/bench_train.py)
    kw = dict(use_mask_atten=False, use_gt_guidance=False,
              use_prm_weights=True, atten_loss_enabled=True)
    # execute once first: the normal-dispatch compile seeds the persistent
    # cache, so the .lower().compile() below is served from cache instead of
    # the tunnel's chipless AOT helper (which 500s on graphs this size)
    _, ld = step(state, batch, jax.random.PRNGKey(1), **kw)
    float(ld["total"])
    compiled = step.lower(state, batch, jax.random.PRNGKey(1), **kw).compile()
    flops, byts = _cost(compiled)
    return _report(f"train_step_512p_bs{bs}_selective_bf16", flops, byts, PEAK_BF16)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    out = []
    if which in ("eval", "both"):
        out.append(eval_entry())
    if which in ("train", "both"):
        out.append(train_entry())
    os.makedirs("output", exist_ok=True)
    with open("output/roofline.json", "w") as f:
        json.dump({"hbm_bw_gbps": HBM_BW / 1e9, "peak_bf16_tflops": PEAK_BF16 / 1e12,
                   "entries": out}, f, indent=1)
    print("[roofline] wrote output/roofline.json")


if __name__ == "__main__":
    main()

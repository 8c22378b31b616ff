"""Attribute traced fusion names back to JAX source ops via compiled HLO.

Builds the bench-condition forward (image or video), compiles it (persistent
cache makes this cheap), dumps the optimized HLO text, and for each requested
fusion prints its output shape and the ``metadata.op_name`` strings of the ops
fused inside — the link between perfetto trace rows and model source lines.

Usage: python tools/hlo_attr.py video fusion.2608 fusion.2486 reduce_window.53 ...
"""

import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _video_fn():
    from bench_video import _clip_batch
    from maggie_tpu.config import load_config
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import fold_spectral_norm
    cfg = load_config("configs/maggie_video.yaml")
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    cfg.model.encoder_args.num_mask = 10
    model = build_model(cfg.model)
    batch = _clip_batch(576, 1024, 3)
    variables = fold_spectral_norm(
        model.init({"params": jax.random.PRNGKey(0)}, batch, train=False))
    prev0 = model.apply(variables, batch, train=False)["refined_masks"][:, 1]
    fn = jax.jit(lambda v, b, p: model.apply(
        v, b, train=False, mem_feat=None, prev_pred=p)["refined_masks"])
    return fn, (variables, batch, prev0)


def _image_fn():
    from __graft_entry__ import _image_model_cfg, _init_variables
    from bench import _blob_batch
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import fold_spectral_norm
    cfg = _image_model_cfg()
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    model = build_model(cfg.model)
    batch = _blob_batch(576, 1024, 3)
    variables = fold_spectral_norm(_init_variables(model, n_i=3))
    fn = jax.jit(lambda v, b: model.apply(v, b, train=False)["refined_masks"])
    return fn, (variables, batch)


def main():
    which, names = sys.argv[1], sys.argv[2:]
    fn, args = _video_fn() if which == "video" else _image_fn()
    txt = fn.lower(*args).compile().as_text()
    print(f"HLO text: {len(txt) / 1e6:.1f} MB", flush=True)

    # computation body of each fusion: "%fused_computation.N { ... }" is linked
    # from the instruction "%fusion.N = <shape> fusion(...), calls=%fused_...".
    lines = txt.splitlines()
    # index instruction lines by lhs name
    instr = {}
    for ln in lines:
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", ln)
        if m:
            instr.setdefault(m.group(1), []).append(ln)

    # map computation name -> list of op_name metadata inside it
    comp_meta = {}
    cur = None
    for ln in lines:
        m = re.match(r"%?([\w.\-]+) (?:\([^)]*\) )?-> .* {$", ln.strip())
        mm = re.match(r"(?:ENTRY )?%?([\w.\-]+) [({]", ln.strip())
        if ln.rstrip().endswith("{") and mm:
            cur = mm.group(1)
            comp_meta[cur] = []
        elif cur is not None:
            for om in re.finditer(r'op_name="([^"]+)"', ln):
                comp_meta[cur].append(om.group(1))
            if ln.strip() == "}":
                cur = None

    for name in names:
        print(f"\n=== {name} ===")
        for ln in instr.get(name, ["<not found>"]):
            print(" ", ln.strip()[:300])
            m = re.search(r"calls=%?([\w.\-]+)", ln)
            if m:
                metas = comp_meta.get(m.group(1), [])
                seen = []
                for s in metas:
                    if s not in seen:
                        seen.append(s)
                for s in seen[:25]:
                    print("    ", s[:220])


if __name__ == "__main__":
    main()

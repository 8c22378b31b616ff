"""cProfile attribution of the host side of a sustained eval sweep.

Answers "where do the seconds per image go" for the end-to-end eval loop
(``tools/bench_sustained.py``): data decode, device dispatch + D2H, reverse
transform, each metric. Run after bench_sustained.py has built the synthetic
set (reuses it).

Usage: python tools/profile_sustained.py [n_images] [--metrics=...]
"""

from __future__ import annotations

import cProfile
import io
import logging
import os
import pstats
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    metrics = ["MAD", "MSE", "SAD", "Grad", "Conn"]
    for a in sys.argv[2:]:
        if a.startswith("--metrics"):
            metrics = a.split("=", 1)[1].split(",")

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    root = os.environ.get("SUSTAINED_ROOT", "/tmp/him_sustained")
    from __graft_entry__ import _image_model_cfg, _init_variables
    from maggie_tpu.engine.test import test as run_test
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import fold_spectral_norm

    cfg = _image_model_cfg()
    cfg.model.precision = "bf16"
    cfg.model.decoder_args.update(dict(sparse_mode="block", block_cap_frac=0.5))
    cfg.name = "profile_sustained"
    cfg.output_dir = "/tmp/profile_sustained_out"
    cfg.dataset.test.merge_from_other(dict(
        name="HIM", root_dir=root, split="natural", short_size=576,
        alpha_dir_name="alphas", mask_dir_name="masks", downscale_mask=True))
    cfg.test.merge_from_other(dict(
        batch_size=1, metrics=metrics, postprocessing=False,
        save_results=False, log_iter=5))

    model = build_model(cfg.model)
    variables = fold_spectral_norm(_init_variables(model, n_i=3))

    # warm: one untimed pass over the same images (compile out of the window)
    run_test(cfg, variables=variables)

    prof = cProfile.Profile()
    prof.enable()
    run_test(cfg, variables=variables)
    prof.disable()

    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()

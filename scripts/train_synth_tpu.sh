#!/usr/bin/env bash
# End-to-end training demonstration on the local TPU chip: 4000 iters of the
# flagship image model on the synthetic I-HIM-style set (output/synth_him,
# built by tools/make_synthetic_him.py), supervised for elastic recovery —
# tunnel drops / preemptions resume from the last ckpt_iter checkpoint.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN_DIR=${1:-output/synth_run}
exec python tools/train_supervisor.py --config output/synth_run/maggie_image/config.yaml \
    --max-restarts 50 --backoff 30 -- \
    output_dir "$RUN_DIR" \
    train.ckpt_iter 100 \
    train.num_workers 2 \
    dataset.train.cache_images 8.0

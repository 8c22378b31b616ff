#!/usr/bin/env bash
# End-to-end training demonstration on the local TPU chip: 4000 iters of the
# flagship image model on the synthetic I-HIM-style set (output/synth_him,
# built by tools/make_synthetic_him.py — created here if missing), supervised
# for elastic recovery — tunnel drops / preemptions resume from the last
# ckpt_iter checkpoint. Works from a fresh checkout: the base config is the
# tracked production one plus dotted overrides (the synthetic-run deltas).
set -euo pipefail
cd "$(dirname "$0")/.."
# effective run dir is $RUN_DIR/<config name> (tools/main.py appends cfg.name)
RUN_DIR=${1:-output/synth_run}
DATA_DIR=${SYNTH_DATA_DIR:-output/synth_him}
[ -d "$DATA_DIR/tr/images" ] || python tools/make_synthetic_him.py "$DATA_DIR"
exec python tools/train_supervisor.py --config configs/maggie_image.yaml \
    --max-restarts 50 --backoff 30 -- \
    output_dir "$RUN_DIR" \
    dataset.train.root_dir "$DATA_DIR" \
    dataset.train.split tr \
    dataset.test.root_dir "$DATA_DIR" \
    dataset.test.split natural \
    dataset.test.mask_dir_name masks \
    dataset.train.cache_images 8.0 \
    model.precision bf16 \
    model.remat selective \
    model.sync_bn false \
    model.warmup_iters 300 \
    model.decoder_args.warmup_detail_iter 300 \
    test.shape_bucketing true \
    test.num_workers 2 \
    train.batch_size 4 \
    train.max_iter 4000 \
    train.val_iter 1000 \
    train.log_iter 100 \
    train.ckpt_iter 100 \
    train.num_workers 2 \
    train.scheduler.warmup_iters 200

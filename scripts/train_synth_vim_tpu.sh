#!/usr/bin/env bash
# End-to-end VIDEO training demonstration on the local TPU chip: the temporal
# flagship (MaGGIe_Temp, bi_fusion) fine-tuned on the synthetic V-HIM-style set
# (output/synth_vim, built by tools/make_synthetic_vim.py — created here if
# missing) from image-run weights, mirroring the reference's image->video
# schedule (reference configs/maggie_video.yaml: model.weights points at the
# trained image model). Supervised for elastic recovery like the image run.
#
# Usage: scripts/train_synth_vim_tpu.sh [RUN_DIR] [IMAGE_WEIGHTS_NPZ]
set -euo pipefail
cd "$(dirname "$0")/.."
RUN_DIR=${1:-output/synth_vid_run}
WEIGHTS=${2:-output/synth_run/maggie_image/best_model.npz}
DATA_DIR=${SYNTH_VIM_DIR:-output/synth_vim}
[ -d "$DATA_DIR/train/fgr" ] || python tools/make_synthetic_vim.py "$DATA_DIR" 20 6 20 288 512
[ -f "$WEIGHTS" ] || { echo "missing image weights $WEIGHTS (run scripts/train_synth_tpu.sh first, or pass '' to train from scratch)" >&2; exit 1; }
exec python tools/train_supervisor.py --config configs/maggie_video.yaml \
    --max-restarts 50 --backoff 30 -- \
    output_dir "$RUN_DIR" \
    dataset.train.root_dir "$DATA_DIR" \
    dataset.train.split train \
    dataset.test.root_dir "$DATA_DIR" \
    dataset.test.split eval \
    dataset.test.mask_dir_name xmem \
    model.weights "$WEIGHTS" \
    model.precision bf16 \
    model.remat selective \
    model.sync_bn false \
    model.warmup_iters 0 \
    model.decoder_args.warmup_detail_iter 0 \
    model.decoder_args.warmup_mask_atten_iter 0 \
    test.shape_bucketing true \
    test.num_workers 2 \
    train.batch_size 2 \
    train.max_iter 400 \
    train.val_iter 200 \
    train.log_iter 20 \
    train.ckpt_iter 50 \
    train.num_workers 2 \
    train.scheduler.warmup_iters 50 \
    train.optimizer.lr 2.0e-5

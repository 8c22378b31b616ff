#!/bin/bash
# V-HIM60 video eval sweep over the three difficulty subsets (reference
# scripts/eval_video.sh). Usage: scripts/eval_video.sh <config> <run-suffix>
set -e
CONFIG=$1
SUFFIX=$2
OUTPUT_DIR=output/video
NAME=eval_full_${SUFFIX}
for SUBSET in easy medium hard; do
  python tools/main.py --config "$CONFIG" --eval-only \
    name "$NAME" \
    output_dir $OUTPUT_DIR \
    dataset.test.split comp_$SUBSET \
    test.save_results False \
    test.log_iter 10
done

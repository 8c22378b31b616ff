#!/usr/bin/env bash
# Carried-ConvGRU-memory A/B on a video eval set: runs eval twice (parity
# fresh-memory mode vs the flag-gated fixed carry, cfg.test.carry_memory) and
# prints both metric blocks. The reference's tuple-only mem_feat carry makes
# released-model eval run with FRESH memory every clip (maggie/engine/
# test.py:252-254) — this quantifies what that bug costs in dtSSD.
#
# Usage: scripts/eval_carry_ab.sh <weights> [root] [split] [mask_dir] [out] [extra dotted overrides...]
# e.g. a CPU-sized run: scripts/eval_carry_ab.sh W output/synth_vim eval xmem \
#        output/carry_ab dataset.test.short_size 144 model.precision f32
set -euo pipefail
cd "$(dirname "$0")/.."
WEIGHTS=$1
ROOT=${2:-output/synth_vim}
SPLIT=${3:-eval}
MASKS=${4:-xmem}
OUT=${5:-output/carry_ab}
shift $(( $# > 5 ? 5 : $# ))
EXTRA=("$@")
for MODE in false true; do
  NAME=carry_${MODE}
  python tools/main.py --config configs/maggie_video.yaml --eval-only \
    output_dir "$OUT" name "$NAME" \
    dataset.test.root_dir "$ROOT" dataset.test.split "$SPLIT" \
    dataset.test.mask_dir_name "$MASKS" \
    model.weights "$WEIGHTS" \
    model.precision bf16 \
    test.shape_bucketing true test.num_workers 2 test.log_iter 50 \
    test.carry_memory "$MODE" "${EXTRA[@]}"
done
echo "=== fresh memory (parity mode) ==="
grep -A10 "Metrics:" "$OUT/carry_false/test-log_rank0.log" | tail -11
echo "=== carried memory (fixed mode) ==="
grep -A10 "Metrics:" "$OUT/carry_true/test-log_rank0.log" | tail -11

#!/bin/bash
# Run a benchmark across all five matryoshka scales (the M3 headline curve).
BENCH=${1:-pope}
CKPT=${2:-debug://tiny}
for SCALE in 1 9 36 144 576; do
    bash scripts/v1_5/eval_mod/$BENCH.sh "$CKPT" "$SCALE" "./eval_out/${BENCH}_scale${SCALE}"
done

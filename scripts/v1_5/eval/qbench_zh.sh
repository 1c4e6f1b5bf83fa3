#!/bin/bash
# Q-Bench (Chinese) entry (reference: scripts/v1_5/eval/qbench_zh.sh):
# same driver with LANG_OPT=zh.
scale_kv=${1:-ver=v0_numtoks=576}
TOKEN_SCALE=$(echo "$scale_kv" | sed -n 's/.*numtoks=\([0-9]*\).*/\1/p')
CKPT=${CKPT:-./checkpoints/llava-v1.5-7b-m3}
SAVE_DIR=${SAVE_DIR:-./eval_out/qbench_zh-${TOKEN_SCALE}}
LANG_OPT=zh exec bash "$(dirname "$0")/../eval_mod/qbench.sh" "$CKPT" "$TOKEN_SCALE" "$SAVE_DIR"

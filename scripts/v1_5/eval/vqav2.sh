#!/bin/bash
# Reference-layout eval entry (reference: scripts/v1_5/eval/vqav2.sh):
# $1 = matryoshka_vis_token_scale kv-string (e.g. ver=v0_numtoks=144).
# The model defaults to the m3 7B checkpoint path; override with $CKPT.
# Delegates to the parameterized driver in ../eval_mod.
scale_kv=${1:-ver=v0_numtoks=576}
TOKEN_SCALE=$(echo "$scale_kv" | sed -n 's/.*numtoks=\([0-9]*\).*/\1/p')
CKPT=${CKPT:-./checkpoints/llava-v1.5-7b-m3}
SAVE_DIR=${SAVE_DIR:-./eval_out/vqav2-${TOKEN_SCALE}}
exec bash "$(dirname "$0")/../eval_mod/vqav2.sh" "$CKPT" "$TOKEN_SCALE" "$SAVE_DIR"

#!/bin/bash
# MME on the LLaVA-NeXT (anyres) m3 checkpoint (reference:
# scripts/v1_5/eval/mme-llava-next.sh): same MME driver, anyres model.
scale_kv=${1:-ver=v0_numtoks=576}
TOKEN_SCALE=$(echo "$scale_kv" | sed -n 's/.*numtoks=\([0-9]*\).*/\1/p')
CKPT=${CKPT:-./checkpoints/llava-next-vicuna-7b-m3}
SAVE_DIR=${SAVE_DIR:-./eval_out/mme-llava-next-${TOKEN_SCALE}}
exec bash "$(dirname "$0")/../eval_mod/mme.sh" "$CKPT" "$TOKEN_SCALE" "$SAVE_DIR"

#!/bin/bash
# Q-Bench driver (reference: scripts/v1_5/eval/qbench.sh), parameterized
# like the other eval_mod drivers; SPLIT=dev|test via env.
CKPT=${1:-debug://tiny}
TOKEN_SCALE=${2:-576}
SAVE_DIR=${3:-./eval_out/qbench}
SPLIT=${SPLIT:-dev}
LANG=${LANG_OPT:-en}
QBENCHDIR=${QBENCHDIR:-./playground/data/eval/qbench}
mkdir -p "$SAVE_DIR"
OUT="$SAVE_DIR/llvisionqa_${SPLIT}_answers.jsonl"
if [ ! -f "$OUT" ]; then
    python -m matryoshka_mm_tpu.eval.model_vqa_qbench \
        --model-path "$CKPT" \
        --image-folder $QBENCHDIR/images_llvisionqa/ \
        --questions-file $QBENCHDIR/llvisionqa_${SPLIT}.json \
        --answers-file "$OUT" \
        --conv-mode llava_v1 --lang $LANG \
        --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
echo "answers written to $OUT"

#!/bin/bash
# TextVQA metagen: answer generation over the 10k OCR TRAIN subset, used
# to produce router-training metadata (reference:
# scripts/v1_5/eval_mod/textvqa_metagen.sh).
CKPT=${1:-debug://tiny}
TOKEN_SCALE=${2:-576}
SAVE_DIR=${3:-./eval_out/textvqa_metagen}
TEXTVQADIR=${TEXTVQADIR:-./playground/data/eval/textvqa}
mkdir -p "$SAVE_DIR"
OUT="$SAVE_DIR/answers.jsonl"
if [ ! -f "$OUT" ]; then
    python -m matryoshka_mm_tpu.eval.model_vqa_loader \
        --model-path "$CKPT" \
        --question-file $TEXTVQADIR/llava_textvqa_train_v051_ocr_10k.jsonl \
        --image-folder $TEXTVQADIR/train_images \
        --answers-file "$OUT" \
        --temperature 0 --conv-mode llava_v1 \
        $( [ -n "$TOKEN_SCALE" ] && echo "--matryoshka_vis_token_scale ver=v0_numtoks=${TOKEN_SCALE}" )
fi
echo "answers at $OUT"

#!/bin/bash
CKPT=${1:-debug://tiny}
TOKEN_SCALE=${2:-576}
SAVE_DIR=${3:-./eval_out/textvqa}
DIR=${TEXTVQADIR:-./playground/data/eval/textvqa}
mkdir -p "$SAVE_DIR"
MERGE="$SAVE_DIR/merge.jsonl"
if [ ! -f "$MERGE" ]; then
    python -m matryoshka_mm_tpu.eval.model_vqa_loader \
        --model-path "$CKPT" \
        --question-file $DIR/llava_textvqa_val_v051_ocr.jsonl \
        --image-folder $DIR/train_images \
        --answers-file "$MERGE" \
        --temperature 0 --conv-mode llava_v1 \
        --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
python -m matryoshka_mm_tpu.eval.eval_textvqa \
    --annotation-file $DIR/TextVQA_0.5.1_val.json \
    --result-file "$MERGE"

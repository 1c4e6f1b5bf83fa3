#!/bin/bash
CKPT=${1:-debug://tiny}; TOKEN_SCALE=${2:-576}; SAVE_DIR=${3:-./eval_out/vizwiz}
DIR=${VIZWIZDIR:-./playground/data/eval/vizwiz}
mkdir -p "$SAVE_DIR"; MERGE="$SAVE_DIR/merge.jsonl"
if [ ! -f "$MERGE" ]; then
  python -m matryoshka_mm_tpu.eval.model_vqa_loader \
    --model-path "$CKPT" --question-file $DIR/llava_test.jsonl \
    --image-folder $DIR/test --answers-file "$MERGE" --temperature 0 \
    --conv-mode llava_v1 \
    --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
python -m matryoshka_mm_tpu.eval.converters vizwiz \
  --annotation-file $DIR/llava_test.jsonl --result-file "$MERGE" \
  --result-upload-file "$SAVE_DIR/upload.json"

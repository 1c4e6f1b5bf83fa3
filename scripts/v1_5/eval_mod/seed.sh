#!/bin/bash
CKPT=${1:-debug://tiny}; TOKEN_SCALE=${2:-576}; SAVE_DIR=${3:-./eval_out/seed}
DIR=${SEEDDIR:-./playground/data/eval/seed_bench}
mkdir -p "$SAVE_DIR"; MERGE="$SAVE_DIR/merge.jsonl"
if [ ! -f "$MERGE" ]; then
  python -m matryoshka_mm_tpu.eval.model_vqa_loader \
    --model-path "$CKPT" --question-file $DIR/llava-seed-bench.jsonl \
    --image-folder $DIR --answers-file "$MERGE" --temperature 0 \
    --conv-mode llava_v1 \
    --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
python -m matryoshka_mm_tpu.eval.converters seed \
  --annotation-file $DIR/SEED-Bench.json --result-file "$MERGE" \
  --result-upload-file "$SAVE_DIR/upload.jsonl"

#!/bin/bash
CKPT=${1:-debug://tiny}; TOKEN_SCALE=${2:-576}; SAVE_DIR=${3:-./eval_out/mmbench}
DIR=${MMBENCHDIR:-./playground/data/eval/mmbench}
SPLIT=${MMBENCH_SPLIT:-mmbench_dev_20230712}
mkdir -p "$SAVE_DIR"
if [ ! -f "$SAVE_DIR/$SPLIT.jsonl" ]; then
  python -m matryoshka_mm_tpu.eval.model_vqa_mmbench \
    --model-path "$CKPT" --question-file $DIR/$SPLIT.tsv \
    --answers-file "$SAVE_DIR/$SPLIT.jsonl" --single-pred-prompt \
    --temperature 0 --conv-mode llava_v1 \
    --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
python -m matryoshka_mm_tpu.eval.converters mmbench \
  --annotation-file $DIR/$SPLIT.tsv --result-dir "$SAVE_DIR" \
  --upload-dir "$SAVE_DIR/upload" --experiment $SPLIT

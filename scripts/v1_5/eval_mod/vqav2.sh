#!/bin/bash
CKPT=${1:-debug://tiny}; TOKEN_SCALE=${2:-576}; SAVE_DIR=${3:-./eval_out/vqav2}
DIR=${VQAV2DIR:-./playground/data/eval/vqav2}; N_CHUNKS=${N_CHUNKS:-1}
SPLIT=llava_vqav2_mscoco_test-dev2015
mkdir -p "$SAVE_DIR"; MERGE="$SAVE_DIR/merge.jsonl"
if [ ! -f "$MERGE" ]; then
  for IDX in $(seq 0 $((N_CHUNKS-1))); do
    python -m matryoshka_mm_tpu.eval.model_vqa_loader \
      --model-path "$CKPT" --question-file $DIR/$SPLIT.jsonl \
      --image-folder $DIR/test2015 \
      --answers-file "$SAVE_DIR/${N_CHUNKS}_${IDX}.jsonl" \
      --num-chunks $N_CHUNKS --chunk-idx $IDX --temperature 0 \
      --conv-mode llava_v1 \
      --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}" &
  done; wait
  cat "$SAVE_DIR"/${N_CHUNKS}_*.jsonl > "$MERGE"
fi
python -m matryoshka_mm_tpu.eval.converters vqav2 --src "$MERGE" \
  --dst "$SAVE_DIR/upload.json" --test_split $DIR/$SPLIT.jsonl

#!/bin/bash
CKPT=${1:-debug://tiny}; TOKEN_SCALE=${2:-576}; SAVE_DIR=${3:-./eval_out/mmvet}
DIR=${MMVETDIR:-./playground/data/eval/mm-vet}
mkdir -p "$SAVE_DIR"; MERGE="$SAVE_DIR/merge.jsonl"
if [ ! -f "$MERGE" ]; then
  python -m matryoshka_mm_tpu.eval.model_vqa \
    --model-path "$CKPT" --question-file $DIR/llava-mm-vet.jsonl \
    --image-folder $DIR/images --answers-file "$MERGE" --temperature 0 \
    --conv-mode llava_v1 \
    --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
python -m matryoshka_mm_tpu.eval.converters mmvet --src "$MERGE" \
  --dst "$SAVE_DIR/results.json"
# GPT-4 grading (needs OPENAI_API_KEY):
#   python -m matryoshka_mm_tpu.eval.eval_mmvet --results_file $SAVE_DIR/results.json \
#     --meta_file $DIR/mm-vet.json --output_file $SAVE_DIR/grades.json

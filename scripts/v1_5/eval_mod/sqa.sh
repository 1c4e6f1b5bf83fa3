#!/bin/bash
CKPT=${1:-debug://tiny}
TOKEN_SCALE=${2:-576}
SAVE_DIR=${3:-./eval_out/sqa}
DIR=${SQADIR:-./playground/data/eval/scienceqa}
mkdir -p "$SAVE_DIR"
MERGE="$SAVE_DIR/merge.jsonl"
if [ ! -f "$MERGE" ]; then
    python -m matryoshka_mm_tpu.eval.model_vqa_science \
        --model-path "$CKPT" \
        --question-file $DIR/llava_test_CQM-A.json \
        --image-folder $DIR/images/test \
        --answers-file "$MERGE" \
        --single-pred-prompt --temperature 0 --conv-mode llava_v1 \
        --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
python -m matryoshka_mm_tpu.eval.eval_science_qa \
    --base-dir $DIR --result-file "$MERGE" \
    --output-file "$SAVE_DIR/output.json" --output-result "$SAVE_DIR/result.json"

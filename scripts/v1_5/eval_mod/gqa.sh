#!/bin/bash
# GQA eval parameterized by checkpoint + token scale (reference protocol:
# chunked answer generation merged to merge.jsonl, idempotent skip).
CKPT=${1:-debug://tiny}
TOKEN_SCALE=${2:-576}
SAVE_DIR=${3:-./eval_out/gqa}
SPLIT=llava_gqa_testdev_balanced
GQADIR=${GQADIR:-./playground/data/eval/gqa}
N_CHUNKS=${N_CHUNKS:-1}

mkdir -p "$SAVE_DIR"
MERGE="$SAVE_DIR/merge.jsonl"
if [ -f "$MERGE" ]; then
    echo "$MERGE exists, skipping generation."
else
    for IDX in $(seq 0 $((N_CHUNKS-1))); do
        python -m matryoshka_mm_tpu.eval.model_vqa_loader \
            --model-path "$CKPT" \
            --question-file $GQADIR/$SPLIT.jsonl \
            --image-folder $GQADIR/images \
            --answers-file "$SAVE_DIR/${N_CHUNKS}_${IDX}.jsonl" \
            --num-chunks $N_CHUNKS --chunk-idx $IDX \
            --temperature 0 --conv-mode llava_v1 \
            --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}" &
    done
    wait
    cat "$SAVE_DIR"/${N_CHUNKS}_*.jsonl > "$MERGE"
fi
python -m matryoshka_mm_tpu.eval.converters gqa --src "$MERGE" \
    --dst "$GQADIR/testdev_balanced_predictions.json"

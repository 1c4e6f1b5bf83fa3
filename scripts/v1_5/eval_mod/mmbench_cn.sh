#!/bin/bash
# MMBench-CN driver (reference: scripts/v1_5/eval/mmbench_cn.sh).
CKPT=${1:-debug://tiny}
TOKEN_SCALE=${2:-576}
SAVE_DIR=${3:-./eval_out/mmbench_cn}
SPLIT=${SPLIT:-mmbench_dev_cn_20231003}
MMBDIR=${MMBDIR:-./playground/data/eval/mmbench_cn}
EXPNAME=$(basename "$CKPT")-${TOKEN_SCALE}
mkdir -p "$SAVE_DIR/answers/$SPLIT" "$SAVE_DIR/answers_upload/$SPLIT"
OUT="$SAVE_DIR/answers/$SPLIT/$EXPNAME.jsonl"
if [ ! -f "$OUT" ]; then
    python -m matryoshka_mm_tpu.eval.model_vqa_mmbench \
        --model-path "$CKPT" \
        --question-file $MMBDIR/$SPLIT.tsv \
        --answers-file "$OUT" \
        --lang cn --single-pred-prompt \
        --temperature 0 --conv-mode llava_v1 \
        --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
python -m matryoshka_mm_tpu.eval.converters mmbench \
    --annotation-file $MMBDIR/$SPLIT.tsv \
    --result-dir "$SAVE_DIR/answers/$SPLIT" \
    --upload-dir "$SAVE_DIR/answers_upload/$SPLIT" \
    --experiment $EXPNAME

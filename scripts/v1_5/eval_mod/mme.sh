#!/bin/bash
# MME driver (reference: scripts/v1_5/eval_mod/mme.sh): generate answers
# over llava_mme.jsonl, then score perception/cognition subscores with the
# in-tree scorer (replaces the dataset tarball's eval_tool/calculation.py).
CKPT=${1:-debug://tiny}
TOKEN_SCALE=${2:-576}
SAVE_DIR=${3:-./eval_out/mme}
MMEDIR=${MMEDIR:-./playground/data/eval/MME}
mkdir -p "$SAVE_DIR"
MERGE="$SAVE_DIR/merge.jsonl"
if [ ! -f "$MERGE" ]; then
    python -m matryoshka_mm_tpu.eval.model_vqa_loader \
        --model-path "$CKPT" \
        --question-file $MMEDIR/llava_mme.jsonl \
        --image-folder $MMEDIR/MME_Benchmark_release_version \
        --answers-file "$MERGE" \
        --temperature 0 --conv-mode llava_v1 \
        --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
python -m matryoshka_mm_tpu.eval.eval_mme \
    --annotation-file $MMEDIR/llava_mme.jsonl \
    --result-file "$MERGE"

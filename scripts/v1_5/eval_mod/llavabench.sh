#!/bin/bash
CKPT=${1:-debug://tiny}; TOKEN_SCALE=${2:-576}; SAVE_DIR=${3:-./eval_out/llavabench}
DIR=${LLAVABENCHDIR:-./playground/data/eval/llava-bench-in-the-wild}
mkdir -p "$SAVE_DIR"; MERGE="$SAVE_DIR/answers.jsonl"
if [ ! -f "$MERGE" ]; then
  python -m matryoshka_mm_tpu.eval.model_vqa \
    --model-path "$CKPT" --question-file $DIR/questions.jsonl \
    --image-folder $DIR/images --answers-file "$MERGE" --temperature 0 \
    --conv-mode llava_v1 \
    --matryoshka_vis_token_scale "ver=v0_numtoks=${TOKEN_SCALE}"
fi
# GPT review vs reference answers (needs OPENAI_API_KEY):
#   python -m matryoshka_mm_tpu.eval.gpt_review -q $DIR/questions.jsonl \
#     -a $DIR/answers_gpt4.jsonl "$MERGE" -r $DIR/rule.json \
#     -c $DIR/context.jsonl -o "$SAVE_DIR/reviews.jsonl"

"""IG-VLM multiple-choice video QA entry
(reference: IG-VLM/eval_llava_multiplechoice.py).
"""

from __future__ import annotations

import argparse

from .evaluation import eval_multiple_choice
from .pipeline import LlavaPipeline


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path_qa_pair_csv", type=str, required=True)
    parser.add_argument("--path_video", type=str, required=True)
    parser.add_argument("--path_result", type=str, required=True)
    parser.add_argument("--model-path", type=str, default="debug://tiny")
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--matryoshka_vis_token_scale", type=str, default=None)
    parser.add_argument("--frame_fixed_number", type=int, default=6)
    args = parser.parse_args()

    pipeline = LlavaPipeline(
        args.model_path, args.path_qa_pair_csv, args.path_video,
        args.path_result, model_base=args.model_base,
        matryoshka_vis_token_scale=args.matryoshka_vis_token_scale,
        frame_fixed_number=args.frame_fixed_number)
    pipeline.set_component(
        "Question: {question}\nOptions:\n{options}\nAnswer with the "
        "option's letter from the given choices directly.",
        max_new_tokens=8)
    df, path = pipeline.do_pipeline()
    print(f"results written to {path}")
    eval_multiple_choice(df)


if __name__ == "__main__":
    main()

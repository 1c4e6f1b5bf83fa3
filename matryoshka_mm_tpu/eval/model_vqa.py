"""Per-question VQA answer generation (reference: llava/eval/model_vqa.py).

Simple (non-prefetching) variant of model_vqa_loader with identical output
format; jsonl questions with ``image`` + ``text`` fields.
"""

from __future__ import annotations

import argparse
import json
import os
import uuid

import numpy as np

from ..constants import DEFAULT_IM_END_TOKEN, DEFAULT_IM_START_TOKEN, DEFAULT_IMAGE_TOKEN
from ..conversation import conv_templates
from ..mm_utils import get_model_name_from_path, process_images, tokenizer_image_token
from ..models.builder import load_pretrained_model
from .model_vqa_loader import get_chunk


def eval_model(args):
    from PIL import Image

    model_path = os.path.expanduser(args.model_path)
    model_name = get_model_name_from_path(model_path)
    tokenizer, model, image_processor, context_len = load_pretrained_model(
        model_path, args.model_base, model_name)

    questions = [json.loads(q)
                 for q in open(os.path.expanduser(args.question_file))]
    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    answers_file = os.path.expanduser(args.answers_file)
    os.makedirs(os.path.dirname(answers_file) or ".", exist_ok=True)
    ans_file = open(answers_file, "w")
    for line in questions:
        idx = line["question_id"]
        image_file = line["image"]
        qs = line["text"]
        cur_prompt = qs
        if getattr(model.config, "mm_use_im_start_end", False):
            qs = (DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
                  + DEFAULT_IM_END_TOKEN + "\n" + qs)
        else:
            qs = DEFAULT_IMAGE_TOKEN + "\n" + qs

        conv = conv_templates[args.conv_mode].copy()
        conv.append_message(conv.roles[0], qs)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()

        input_ids = np.asarray(tokenizer_image_token(prompt, tokenizer),
                               np.int32)[None, :]
        image = Image.open(
            os.path.join(args.image_folder, image_file)).convert("RGB")
        pixels = np.asarray(
            process_images([image], image_processor, model.config), np.float32)

        output_ids = model.generate(
            input_ids, images=pixels, image_sizes=[image.size],
            matryoshka_vis_token_scale=args.matryoshka_vis_token_scale,
            do_sample=args.temperature > 0, temperature=args.temperature,
            top_p=args.top_p if args.top_p is not None else 1.0,
            max_new_tokens=1024,
            eos_token_id=getattr(tokenizer, "eos_token_id", 2),
            num_beams=args.num_beams,
            pad_token_id=getattr(tokenizer, "pad_token_id", 0) or 0)
        outputs = tokenizer.batch_decode(
            output_ids, skip_special_tokens=True)[0].strip()

        ans_file.write(json.dumps({
            "question_id": idx, "prompt": cur_prompt, "text": outputs,
            "answer_id": str(uuid.uuid4())[:8], "model_id": model_name,
            "metadata": {}}) + "\n")
        ans_file.flush()
    ans_file.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, default="debug://tiny")
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--image-folder", type=str, default="")
    parser.add_argument("--question-file", type=str, default="tables/question.jsonl")
    parser.add_argument("--answers-file", type=str, default="answer.jsonl")
    parser.add_argument("--conv-mode", type=str, default="llava_v1")
    parser.add_argument("--num-chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--top_p", type=float, default=None)
    parser.add_argument("--num_beams", type=int, default=1)
    parser.add_argument("--matryoshka_vis_token_scale", type=str, default=None)
    eval_model(parser.parse_args())

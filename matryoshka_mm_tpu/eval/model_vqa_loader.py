"""Batched VQA answer generation (reference: llava/eval/model_vqa_loader.py).

Deterministic shuffled chunking for multi-host eval sharding
(``--num-chunks/--chunk-idx``, reference :20-28), greedy decoding, answers
written as jsonl.  Host-side data loading is overlapped with device decode
by a one-item prefetch thread.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import uuid
from queue import Queue
from threading import Thread

import numpy as np

from ..constants import DEFAULT_IM_END_TOKEN, DEFAULT_IM_START_TOKEN, DEFAULT_IMAGE_TOKEN
from ..conversation import SeparatorStyle, conv_templates
from ..mm_utils import get_model_name_from_path, process_images, tokenizer_image_token
from ..models.builder import load_pretrained_model


def get_chunk(lst, n, k, seed=0):
    """Deterministically shuffle then split into n chunks, return chunk k
    (reference: model_vqa_loader.py:20-28)."""
    random.seed(seed)
    indices = list(range(len(lst)))
    random.shuffle(indices)
    chunk_size = math.ceil(len(lst) / n)
    chunks = [indices[i:i + chunk_size] for i in range(0, len(indices), chunk_size)]
    chunk = [lst[idx] for idx in chunks[k]]
    return chunk


def _prepare(line, image_folder, tokenizer, image_processor, model_config,
             conv_mode, mm_use_im_start_end):
    from PIL import Image

    qs = line["text"]
    if mm_use_im_start_end:
        qs = (DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
              + DEFAULT_IM_END_TOKEN + "\n" + qs)
    else:
        qs = DEFAULT_IMAGE_TOKEN + "\n" + qs

    conv = conv_templates[conv_mode].copy()
    conv.append_message(conv.roles[0], qs)
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()

    image = Image.open(os.path.join(image_folder, line["image"])).convert("RGB")
    pixels = process_images([image], image_processor, model_config)
    input_ids = np.asarray(tokenizer_image_token(prompt, tokenizer),
                           np.int32)[None, :]
    return input_ids, np.asarray(pixels, np.float32), image.size, prompt


def eval_model(args):
    model_name = get_model_name_from_path(args.model_path)
    tokenizer, model, image_processor, context_len = load_pretrained_model(
        args.model_path, args.model_base, model_name)

    questions = [json.loads(q) for q in open(os.path.expanduser(args.question_file))]
    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    answers_file = os.path.expanduser(args.answers_file)
    os.makedirs(os.path.dirname(answers_file) or ".", exist_ok=True)
    ans_file = open(answers_file, "w")

    if ("plain" in model_name and "finetune" not in model_name.lower()
            and "mmtag" not in args.conv_mode):
        args.conv_mode = args.conv_mode + "_mmtag"
        print(f"It seems that this is a plain model, but it is not using a "
              f"mmtag prompt, auto switching to {args.conv_mode}.")

    mm_use_im_start_end = getattr(model.config, "mm_use_im_start_end", False)

    # one-item host-side prefetch so image decode overlaps device decode
    q: Queue = Queue(maxsize=2)

    def producer():
        for line in questions:
            q.put((line, _prepare(line, args.image_folder, tokenizer,
                                  image_processor, model.config,
                                  args.conv_mode, mm_use_im_start_end)))
        q.put(None)

    Thread(target=producer, daemon=True).start()

    def flush_batch(batch):
        """Left-pad the batch to a shared bucketed length, one generate call
        for all rows (TPU prefers batched decodes; greedy outputs are
        identical to batch-1 thanks to the attention mask)."""
        if not batch:
            return
        pad_id = getattr(tokenizer, "pad_token_id", 0) or 0
        T = max(x[1][0].shape[1] for x in batch)
        T = -(-T // 32) * 32
        B = len(batch)
        ids = np.full((B, T), pad_id, np.int32)
        mask = np.zeros((B, T), bool)
        pixels = np.concatenate([x[1][1] for x in batch], axis=0)
        for b, (_, (row_ids, _, _, _)) in enumerate(batch):
            n = row_ids.shape[1]
            ids[b, T - n:] = row_ids[0]
            mask[b, T - n:] = True
        output_ids = model.generate(
            ids, images=pixels, attention_mask=mask,
            image_sizes=[x[1][2] for x in batch],
            matryoshka_vis_token_scale=args.matryoshka_vis_token_scale,
            do_sample=args.temperature > 0,
            temperature=args.temperature,
            top_p=args.top_p if args.top_p is not None else 1.0,
            max_new_tokens=args.max_new_tokens,
            eos_token_id=getattr(tokenizer, "eos_token_id", 2),
            pad_token_id=pad_id,
            num_beams=args.num_beams,
        )
        texts = tokenizer.batch_decode(output_ids, skip_special_tokens=True)
        for (line, _), text in zip(batch, texts):
            ans_file.write(json.dumps({
                "question_id": line["question_id"],
                "prompt": line["text"],
                "text": text.strip(),
                "answer_id": str(uuid.uuid4())[:8],
                "model_id": model_name,
                "metadata": {},
            }) + "\n")
        ans_file.flush()

    batch = []
    while True:
        item = q.get()
        if item is None:
            break
        batch.append(item)
        # beam search decodes batch-1; don't batch rows under --num_beams
        if len(batch) >= (1 if args.num_beams > 1 else args.batch_size):
            flush_batch(batch)
            batch = []
    flush_batch(batch)
    ans_file.close()


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, default="debug://tiny")
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--image-folder", type=str, default="")
    parser.add_argument("--question-file", type=str,
                        default="tables/question.jsonl")
    parser.add_argument("--answers-file", type=str, default="answer.jsonl")
    parser.add_argument("--conv-mode", type=str, default="llava_v1")
    parser.add_argument("--num-chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=1,
                        help="TPU batched generation (greedy outputs match "
                             "batch-1 exactly)")
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--top_p", type=float, default=None)
    parser.add_argument("--num_beams", type=int, default=1)
    parser.add_argument("--max_new_tokens", type=int, default=128)
    parser.add_argument("--matryoshka_vis_token_scale", type=str, default=None)
    return parser


if __name__ == "__main__":
    eval_model(build_parser().parse_args())

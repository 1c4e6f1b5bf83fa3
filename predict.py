"""Replicate/cog serving entry (reference: predict.py:1-196).

Loads the flagship model once at setup and streams generations per request.
The cog BasePredictor interface is duck-typed so this file also runs
standalone: ``python predict.py --image ... --prompt ...``.
"""

from __future__ import annotations

import argparse
import os
from typing import Iterator, Optional

import numpy as np

from matryoshka_mm_tpu.constants import DEFAULT_IMAGE_TOKEN
from matryoshka_mm_tpu.conversation import SeparatorStyle, conv_templates
from matryoshka_mm_tpu.mm_utils import process_images, tokenizer_image_token
from matryoshka_mm_tpu.models.builder import load_pretrained_model

DEFAULT_MODEL = os.environ.get("LLAVA_MODEL_PATH", "debug://7b")


class Predictor:
    def setup(self, weights: Optional[str] = None) -> None:
        """Load the model into memory (reference: predict.py setup —
        downloads weights via pget there; here weights come from a local
        path or the debug config)."""
        path = weights or DEFAULT_MODEL
        (self.tokenizer, self.model, self.image_processor,
         self.context_len) = load_pretrained_model(path, None, None)

    def predict(self, image: str, prompt: str, top_p: float = 1.0,
                temperature: float = 0.2, max_tokens: int = 1024,
                matryoshka_vis_token_scale: Optional[str] = None,
                ) -> Iterator[str]:
        """Run a single prediction, streaming text chunks."""
        from PIL import Image

        from matryoshka_mm_tpu.generate import GenerationConfig, stream_generate

        conv = conv_templates["llava_v1"].copy()
        conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + prompt)
        conv.append_message(conv.roles[1], None)
        full_prompt = conv.get_prompt()

        img = Image.open(image).convert("RGB")
        pixels = np.asarray(process_images([img], self.image_processor,
                                           self.model.config), np.float32)
        input_ids = np.asarray(
            tokenizer_image_token(full_prompt, self.tokenizer), np.int32)[None, :]

        gen_cfg = GenerationConfig(
            max_new_tokens=max_tokens, temperature=temperature, top_p=top_p,
            do_sample=temperature > 0,
            eos_token_id=getattr(self.tokenizer, "eos_token_id", 2),
            pad_token_id=getattr(self.tokenizer, "pad_token_id", 0) or 0,
            decode_chunk=8)

        stop = conv.sep if conv.sep_style != SeparatorStyle.TWO else conv.sep2
        printed = ""
        for ids in stream_generate(self.model.params, self.model.cfg,
                                   input_ids, pixels,
                                   matryoshka_vis_token_scale=matryoshka_vis_token_scale,
                                   gen_cfg=gen_cfg):
            text = self.tokenizer.decode(
                [int(t) for t in ids[0] if t != gen_cfg.pad_token_id],
                skip_special_tokens=True)
            if stop and stop in text:
                text = text.split(stop)[0]
                yield text[len(printed):]
                return
            yield text[len(printed):]
            printed = text


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--prompt", type=str, required=True)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--max-tokens", type=int, default=256)
    parser.add_argument("--matryoshka_vis_token_scale", type=str, default=None)
    args = parser.parse_args()

    p = Predictor()
    p.setup(args.weights)
    for chunk in p.predict(args.image, args.prompt,
                           temperature=args.temperature,
                           max_tokens=args.max_tokens,
                           matryoshka_vis_token_scale=args.matryoshka_vis_token_scale):
        print(chunk, end="", flush=True)
    print()

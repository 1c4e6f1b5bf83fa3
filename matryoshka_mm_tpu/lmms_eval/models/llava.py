"""LLaVA model adapter for the lmms-eval harness
(reference: lmms-eval/lmms_eval/models/llava.py:44-428).

Honors ``matryoshka_vis_token_scale`` by setting it on the model config and
forwarding it to generate (reference :96-97, :401).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ...constants import DEFAULT_IMAGE_TOKEN
from ...conversation import SeparatorStyle, conv_templates
from ...mm_utils import process_images, tokenizer_image_token
from ...models.builder import load_pretrained_model
from ..api.instance import Instance
from ..api.model import lmms
from ..api.registry import register_model


@register_model("llava")
class Llava(lmms):
    def __init__(self, pretrained: str = "debug://tiny",
                 model_base: Optional[str] = None,
                 model_name: Optional[str] = None,
                 conv_template: str = "vicuna_v1",
                 matryoshka_vis_token_scale: Optional[str] = None,
                 device: str = "tpu", batch_size: int = 1, **kwargs):
        super().__init__()
        (self.tokenizer, self.model, self.image_processor,
         self.context_len) = load_pretrained_model(pretrained, model_base,
                                                   model_name)
        self.conv_template = conv_template
        # plumb the scale knob through the model config (reference :96-97)
        self.model.config.matryoshka_vis_token_scale = matryoshka_vis_token_scale
        self.matryoshka_vis_token_scale = matryoshka_vis_token_scale
        self.batch_size = max(int(batch_size), 1)

    def _build_prompt(self, context: str, has_image: bool) -> str:
        conv = conv_templates[self.conv_template].copy()
        q = (DEFAULT_IMAGE_TOKEN + "\n" + context) if has_image else context
        conv.append_message(conv.roles[0], q)
        conv.append_message(conv.roles[1], None)
        return conv.get_prompt()

    def _postprocess(self, text: str) -> str:
        text = text.strip()
        conv = conv_templates[self.conv_template].copy()
        stop = conv.sep if conv.sep_style != SeparatorStyle.TWO else conv.sep2
        if stop and stop in text:
            text = text.split(stop)[0].strip()
        return text

    def generate_until(self, requests: List[Instance]) -> List[str]:
        """Batched greedy/sampled generation.  Requests are grouped by
        generation kwargs and image presence, left-padded to a shared
        length, and decoded as one pool (reference adapter batches through
        a collator the same way, lmms-eval models/llava.py:300+)."""
        import json as _json

        out: List[Optional[str]] = [None] * len(requests)
        groups = {}
        for i, req in enumerate(requests):
            _, gen_kwargs, visual = req.arguments
            key = (_json.dumps(gen_kwargs, sort_keys=True, default=str),
                   visual is not None)
            groups.setdefault(key, []).append(i)

        for (gk_s, has_img), idxs in groups.items():
            gen_kwargs = _json.loads(gk_s)
            temperature = float(gen_kwargs.get("temperature", 0.0))
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start:start + self.batch_size]
                ids_list, pix_list = [], []
                for i in chunk:
                    context, _, visual = requests[i].arguments
                    prompt = self._build_prompt(context, has_img)
                    ids_list.append(np.asarray(
                        tokenizer_image_token(prompt, self.tokenizer),
                        np.int32))
                    if has_img:
                        pix_list.append(np.asarray(process_images(
                            [visual], self.image_processor,
                            self.model.config), np.float32)[0])
                L = max(len(x) for x in ids_list)
                B = len(chunk)
                input_ids = np.zeros((B, L), np.int32)
                mask = np.zeros((B, L), bool)
                for r, x in enumerate(ids_list):          # left padding
                    input_ids[r, L - len(x):] = x
                    mask[r, L - len(x):] = True
                pixels = np.stack(pix_list) if has_img else None
                output_ids = self.model.generate(
                    input_ids, images=pixels, attention_mask=mask,
                    matryoshka_vis_token_scale=self.matryoshka_vis_token_scale,
                    do_sample=temperature > 0, temperature=temperature,
                    top_p=float(gen_kwargs.get("top_p", 1.0)),
                    max_new_tokens=int(gen_kwargs.get("max_new_tokens", 16)),
                    eos_token_id=getattr(self.tokenizer, "eos_token_id", 2),
                    pad_token_id=getattr(self.tokenizer, "pad_token_id", 0) or 0)
                texts = self.tokenizer.batch_decode(output_ids,
                                                    skip_special_tokens=True)
                for i, t in zip(chunk, texts):
                    t = self._postprocess(t)
                    out[i] = t
                    requests[i].resps.append(t)
        return out  # type: ignore[return-value]

    def loglikelihood(self, requests: List[Instance]) -> List[Tuple[float, bool]]:
        """Score P(continuation | context [+ image]); greedy-match flag."""
        import jax.numpy as jnp

        from ...models.llava import forward_spliced, prepare_multimodal
        from ...train.losses import compute_seq_logprob
        from ...constants import IGNORE_INDEX
        from ...kvconfig import parse_kv_from_string

        out = []
        for req in requests:
            context, continuation, visual = req.arguments
            prompt = self._build_prompt(context, visual is not None)
            ctx_ids = tokenizer_image_token(prompt, self.tokenizer)
            cont_ids = self.tokenizer(continuation).input_ids
            if cont_ids and cont_ids[0] == getattr(self.tokenizer,
                                                   "bos_token_id", None):
                cont_ids = cont_ids[1:]
            ids = np.asarray(ctx_ids + list(cont_ids), np.int32)[None, :]
            labels = np.full_like(ids, IGNORE_INDEX)
            labels[0, len(ctx_ids):] = ids[0, len(ctx_ids):]

            scale = self.matryoshka_vis_token_scale
            numtoks = self.model.cfg.vision.num_patches
            if scale:
                kvs = parse_kv_from_string(scale)
                if isinstance(kvs.get("numtoks"), int):
                    numtoks = int(kvs["numtoks"])
            if visual is not None:
                pixels = np.asarray(process_images(
                    [visual], self.image_processor, self.model.config),
                    np.float32)
                spliced, _ = prepare_multimodal(
                    self.model.params, self.model.cfg, jnp.asarray(ids),
                    jnp.asarray(pixels), numtoks=numtoks,
                    labels=jnp.asarray(labels))
                logits = forward_spliced(self.model.params, self.model.cfg, spliced)
                lp = float(compute_seq_logprob(logits, spliced.labels)[0])
                shift_labels = np.asarray(spliced.labels)[0, 1:]
                preds = np.asarray(logits.argmax(-1))[0, :-1]
            else:
                from ...models.llama import llama_logits

                logits = llama_logits(self.model.params["llama"],
                                      self.model.cfg.llama, jnp.asarray(ids))
                lp = float(compute_seq_logprob(logits, jnp.asarray(labels))[0])
                shift_labels = labels[0, 1:]
                preds = np.asarray(logits.argmax(-1))[0, :-1]
            mask = shift_labels != IGNORE_INDEX
            greedy = bool((preds[mask] == shift_labels[mask]).all())
            out.append((lp, greedy))
            req.resps.append((lp, greedy))
        return out

"""Checkpoint loading: ``load_pretrained_model``.

API-parity port of the reference loader (reference: llava/model/
builder.py:27-192) returning ``(tokenizer, model, image_processor,
context_len)``.  Sources handled:

* ``debug://tiny`` / ``debug://7b`` — random-init configs (tests, benches;
  no network egress in this environment);
* a local HF/LLaVA torch checkpoint directory (config.json +
  pytorch_model*.bin / *.safetensors) — converted leaf-by-leaf;
* LoRA checkpoints (``model_base`` + adapter + non_lora_trainables.bin),
  merged at load (builder.py:70-113);
* projector-only checkpoints (``mm_projector.bin`` + ``model_base``,
  builder.py:115-123);
* native orbax checkpoints saved by this framework's trainer.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional, Tuple


from ..constants import DEFAULT_IM_END_TOKEN, DEFAULT_IM_START_TOKEN, DEFAULT_IMAGE_PATCH_TOKEN
from ..image_processing import ClipImageProcessor
from .clip import ClipVisionConfig
from .llama import LlamaConfig
from .llava import LlavaConfig, M3Preset, init_llava_params


def is_mm_model(model_path: str) -> bool:
    """reference: builder.py:21-24 — by name convention."""
    name = model_path.lower()
    return "llava" in name or model_path.startswith("debug://")


class LlavaModel:
    """Thin stateful facade over (params, cfg) exposing the reference's
    model surface (generate / forward / config) for eval & serving code."""

    def __init__(self, params: dict, cfg: LlavaConfig):
        self.params = params
        self.cfg = cfg
        self.config = _ConfigView(cfg)

    def generate(self, input_ids, images=None, image_sizes=None,
                 attention_mask=None,
                 matryoshka_vis_token_scale=None, max_new_tokens=128,
                 temperature=0.0, top_p=1.0, do_sample=False,
                 eos_token_id=2, pad_token_id=0, stopping_criteria=None,
                 use_cache=True, num_beams=1, speculative=False, **kw):
        from ..generate import (GenerationConfig, beam_generate, generate,
                                speculative_generate)

        scale = matryoshka_vis_token_scale or getattr(
            self.config, "matryoshka_vis_token_scale", None)
        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, do_sample=do_sample, eos_token_id=eos_token_id,
            pad_token_id=pad_token_id)
        if getattr(self, "tp_engine", None) is not None \
                and num_beams == 1 and not speculative:
            # kernel-preserving tensor-parallel path (parallel/tp_decode):
            # the engine raises with routing advice on the modes it does
            # not cover (v2 combine, anyres, multi-image)
            return self.tp_engine.generate(
                input_ids, images, image_sizes=image_sizes,
                attention_mask=attention_mask,
                matryoshka_vis_token_scale=scale, gen_cfg=gen_cfg,
                stopping_criteria=stopping_criteria)
        if num_beams != 1:
            # reference surface: HF generate(num_beams=N) behind the eval
            # scripts' --num-beams flag (beam search is deterministic;
            # sampling knobs are ignored, matching HF at temperature 0)
            return beam_generate(
                self.params, self.cfg, input_ids, images,
                image_sizes=image_sizes, attention_mask=attention_mask,
                matryoshka_vis_token_scale=scale, num_beams=num_beams,
                gen_cfg=gen_cfg, stopping_criteria=stopping_criteria)
        if speculative:
            # prompt-lookup decoding: greedy, B=1, no anyres
            return speculative_generate(
                self.params, self.cfg, input_ids, images,
                matryoshka_vis_token_scale=scale, gen_cfg=gen_cfg)
        return generate(self.params, self.cfg, input_ids, images,
                        image_sizes=image_sizes, attention_mask=attention_mask,
                        matryoshka_vis_token_scale=scale, gen_cfg=gen_cfg,
                        stopping_criteria=stopping_criteria)

    def gating_probs(self, images):
        from ..generate import gating_probs

        return gating_probs(self.params, self.cfg, images)


class _ConfigView:
    """Attribute view mirroring the reference's HF config object surface."""

    def __init__(self, cfg: LlavaConfig):
        self._cfg = cfg
        self.image_aspect_ratio = cfg.image_aspect_ratio
        self.image_grid_pinpoints = cfg.image_grid_pinpoints
        self.mm_patch_merge_type = cfg.mm_patch_merge_type
        self.tokenizer_model_max_length = cfg.tokenizer_model_max_length
        self.config = {
            "use_alternative": cfg.preset.use_alternative,
            "projection_type": cfg.preset.projection_type,
            "matryoshka_vis_token_scale": cfg.preset.matryoshka_vis_token_scale,
            "moe": cfg.preset.moe,
            "projector_loc": cfg.preset.projector_loc,
            "lm_loss_type": cfg.preset.lm_loss_type,
        }
        self.matryoshka_vis_token_scale = None  # runtime knob (lmms-eval sets it)


def _load_torch_state_dict(path: str) -> dict:
    sd = {}
    safes = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if safes:
        from safetensors import safe_open

        for f in safes:
            with safe_open(f, framework="np") as fh:
                for k in fh.keys():
                    sd[k] = fh.get_tensor(k)
    elif bins:
        import torch

        for f in bins:
            part = torch.load(f, map_location="cpu", weights_only=True)
            sd.update(part)
    else:
        raise FileNotFoundError(f"no torch weights found under {path}")
    return sd


def _cfg_from_hf_config(d: dict) -> LlavaConfig:
    llama = LlamaConfig(
        vocab_size=d.get("vocab_size", 32000),
        hidden_size=d.get("hidden_size", 4096),
        intermediate_size=d.get("intermediate_size", 11008),
        num_hidden_layers=d.get("num_hidden_layers", 32),
        num_attention_heads=d.get("num_attention_heads", 32),
        num_key_value_heads=d.get("num_key_value_heads",
                                  d.get("num_attention_heads", 32)),
        max_position_embeddings=d.get("max_position_embeddings", 4096),
        rms_norm_eps=d.get("rms_norm_eps", 1e-5),
        rope_theta=d.get("rope_theta", 10000.0),
        dtype="bfloat16",
    )
    if "vision_tower_config" in d:
        # non-standard tower dims (custom or test checkpoints); standard
        # liuhaotian configs carry only the tower NAME, always ViT-L/336
        vision = ClipVisionConfig(
            **d["vision_tower_config"],
            select_layer=d.get("mm_vision_select_layer", -2),
            select_feature=d.get("mm_vision_select_feature", "patch"),
            dtype="bfloat16",
        )
    else:
        vision = ClipVisionConfig.vit_l_14_336(
            select_layer=d.get("mm_vision_select_layer", -2),
            select_feature=d.get("mm_vision_select_feature", "patch"),
            dtype="bfloat16",
        )
    preset = M3Preset.from_dict(d.get("config"))
    return LlavaConfig(
        llama=llama,
        vision=vision,
        preset=preset,
        mm_projector_type=d.get("mm_projector_type", "linear"),
        mm_patch_merge_type=d.get("mm_patch_merge_type", "flat"),
        image_aspect_ratio=d.get("image_aspect_ratio", "square"),
        image_grid_pinpoints=d.get("image_grid_pinpoints"),
        tokenizer_model_max_length=d.get("tokenizer_model_max_length", 2048),
        # the reference derives the router's feature taps from the moe
        # kv-string's ft= key (llava_arch.py:250), not a config field
        router_feature_types=_router_features(preset),
    )


def _router_features(preset) -> tuple:
    moe = getattr(preset, "moe", None)
    if not moe:
        return ()
    from ..kvconfig import parse_kv_from_string

    ft = parse_kv_from_string(moe).get("ft")
    return tuple(str(ft).split(",")) if ft else ()


class DebugTokenizer:
    """Deterministic whitespace tokenizer for offline tests & benches.

    legacy=True + </s> as its own token keeps the v1 target-masking length
    arithmetic exact (per-round BOS stands in for the </s> separator, like
    the original slow Llama tokenizer)."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    unk_token_id = 3
    model_max_length = 2048
    legacy = True

    def __init__(self, vocab_size: int = 32000):
        self.vocab_size = vocab_size

    def __call__(self, text, **kw):
        span = self.vocab_size - 100
        ids = [self.bos_token_id] + [
            self.eos_token_id if w == "</s>" else (hash(w) % span) + 100
            for w in text.replace("</s>", " </s> ").split()
        ]

        class Out:
            pass

        o = Out()
        o.input_ids = ids
        return o

    def decode(self, ids, skip_special_tokens=True):
        # decode MUST agree with convert_ids_to_tokens: constrained
        # decoding masks token ids by their piece text, so the delivered
        # text has to be the same pieces concatenated or a client could
        # never observe that the output matches its regex/schema
        pieces = self.convert_ids_to_tokens(
            [i for i in ids
             if not (skip_special_tokens and i in (0, 1, 2, 3))])
        return "".join(pieces)

    def batch_decode(self, batch, skip_special_tokens=True):
        return [self.decode(x, skip_special_tokens) for x in batch]

    def convert_ids_to_tokens(self, ids):
        """Piece per id, HF-style (enables constrained decoding on the
        debug model): a small cyclic piece set so regex/JSON constraints
        are satisfiable offline."""
        pieces = ["yes", "no", "A", "B", "C", "D", "true", "false",
                  "0", "1", "2", "3", ".", ",", " ", '"', "{", "}", ":",
                  "x"]
        return ["<pad>" if i == 0 else "<s>" if i == 1 else "</s>"
                if i == 2 else "<unk>" if i == 3
                else pieces[(i - 4) % len(pieces)] for i in ids]


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    model_name: Optional[str] = None,
    load_8bit: bool = False,
    load_4bit: bool = False,
    device_map: str = "auto",
    device: str = "tpu",
    use_flash_attn: bool = False,
    quant_fuse: bool = True,
    kv_cache_dtype: str = "",
    tp_size: int = 0,
    **kwargs,
) -> Tuple[object, LlavaModel, ClipImageProcessor, int]:
    """reference: builder.py:27-192.  Returns (tokenizer, model,
    image_processor, context_len).

    ``kv_cache_dtype='int8'`` stores KV cache slots int8 with per-slot
    scales (no reference analog — TPU-side extension): halves decode
    attention reads and doubles cache capacity at a small accuracy cost.

    ``tp_size>1`` is the reference's multi-GPU ``device_map='auto'``
    (builder.py:45-49) done the TPU way: weights are placed TP-sharded
    over a (1, tp) mesh and GSPMD partitions the same jitted graphs
    (parallel/inference.py) — how a 13B fits chips it can't fit alone.
    Composes with load_8bit/4bit only under ``quant_fuse=False`` (the
    fused Pallas decode kernels are single-chip programs).
    """
    import dataclasses

    import jax

    if tp_size > 1 and (load_8bit or load_4bit):
        # The TP engine shards the UNFUSED quantized layout exactly and
        # re-fuses each device's local shard (parallel/tp_decode.py), so
        # quantized TP keeps the fused Pallas decode kernels.
        quant_fuse = False

    model_name = model_name or os.path.basename(model_path.rstrip("/"))
    image_processor = ClipImageProcessor()

    def _with_kv(cfg):
        if not kv_cache_dtype or cfg.llama.kv_cache_dtype == kv_cache_dtype:
            return cfg
        return dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama,
                                           kv_cache_dtype=kv_cache_dtype))

    def _model(params, cfg):
        cfg = _with_kv(cfg)
        model = LlavaModel(params, cfg)
        if tp_size > 1:
            # kernel-preserving TP (parallel/tp_decode.py): every device
            # runs the single-chip code path — fused quantized matmuls and
            # flash-decode attention included — on its local megatron
            # shard.  The GSPMD placement (parallel/inference.py) remains
            # available for the modes the engine rejects.
            from ..parallel.tp_decode import TPEngine

            model.tp_engine = TPEngine(params, cfg, tp_size)
        return model

    # ---- debug configs (no weights on disk) ----
    if model_path.startswith("debug://"):
        which = model_path.split("//", 1)[1]
        if which.startswith("tiny"):
            cfg = LlavaConfig.tiny_debug(
                moe="t=dense_ft=cls_obj=weightedlm" if "moe" in which else None)
        elif which == "7b":
            cfg = LlavaConfig.llava_v15_7b_m3()
        else:
            raise ValueError(f"unknown debug model {which!r}")
        # size the image front-end to the config's crop (tiny = 56px)
        s = cfg.vision.image_size
        image_processor = ClipImageProcessor(
            size={"shortest_edge": s}, crop_size={"height": s, "width": s})
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        params = maybe_quantize(params, load_8bit, load_4bit, quant_fuse)
        return DebugTokenizer(cfg.llama.vocab_size), _model(params, cfg), \
            image_processor, cfg.tokenizer_model_max_length

    # ---- native orbax checkpoint ----
    if os.path.exists(os.path.join(model_path, "llava_config.json")):
        from ..utils.checkpoint import load_checkpoint

        params, cfg = load_checkpoint(model_path)
        tokenizer = _load_tokenizer(model_path, model_base)
        return tokenizer, _model(params, cfg), image_processor, \
            cfg.tokenizer_model_max_length

    # ---- HF/LLaVA torch checkpoint ----
    with open(os.path.join(model_path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = _cfg_from_hf_config(hf_cfg)

    from .convert import (cast_pytree, convert_llava_checkpoint, merge_lora)

    lora_cfg_path = os.path.join(model_path, "adapter_config.json")
    proj_only = os.path.exists(os.path.join(model_path, "mm_projector.bin"))

    if os.path.exists(lora_cfg_path):
        # LoRA: base weights + adapter delta + non-LoRA trainables
        if model_base is None:
            raise ValueError("LoRA checkpoints require model_base")
        with open(lora_cfg_path) as f:
            lora_cfg = json.load(f)
        base_sd = _load_torch_state_dict(model_base)
        import torch

        adapter = torch.load(os.path.join(model_path, "adapter_model.bin"),
                             map_location="cpu", weights_only=True)
        scaling = lora_cfg.get("lora_alpha", 16) / lora_cfg.get("r", 64)
        sd = merge_lora(base_sd, adapter, scaling)
        non_lora = os.path.join(model_path, "non_lora_trainables.bin")
        if os.path.exists(non_lora):
            extra = torch.load(non_lora, map_location="cpu", weights_only=True)
            sd.update({k.replace("base_model.model.", ""): v
                       for k, v in extra.items()})
    elif proj_only:
        # projector-only checkpoint on top of a base LM (builder.py:115-123)
        if model_base is None:
            raise ValueError("projector-only checkpoints require model_base")
        sd = _load_torch_state_dict(model_base)
        import torch

        proj = torch.load(os.path.join(model_path, "mm_projector.bin"),
                          map_location="cpu", weights_only=True)
        sd.update(proj)
    else:
        sd = _load_torch_state_dict(model_path)

    params = convert_llava_checkpoint(sd, cfg)
    if "vision_tower" not in params:
        # vision weights not in the checkpoint: random-init (the reference
        # downloads openai/clip-vit-large-patch14-336 here; no egress)
        from .clip import init_clip_params

        params["vision_tower"] = init_clip_params(jax.random.PRNGKey(0), cfg.vision)
    params = cast_pytree(params, "bfloat16")
    params = maybe_quantize(params, load_8bit, load_4bit, quant_fuse)

    tokenizer = _load_tokenizer(model_path, model_base)
    context_len = hf_cfg.get("max_sequence_length",
                             cfg.tokenizer_model_max_length)
    return tokenizer, _model(params, cfg), image_processor, context_len


def _load_tokenizer(model_path: str, model_base: Optional[str]):
    for p in (model_path, model_base):
        if p and (os.path.exists(os.path.join(p, "tokenizer.json"))
                  or os.path.exists(os.path.join(p, "tokenizer.model"))):
            try:
                from transformers import AutoTokenizer

                return AutoTokenizer.from_pretrained(p, use_fast=True)
            except Exception:
                pass
    return DebugTokenizer()


def maybe_quantize(params: dict, load_8bit: bool, load_4bit: bool,
                   fuse: bool = True) -> dict:
    """bitsandbytes-equivalent weight compression (reference:
    builder.py:51-60).  ``fuse=True`` is the inference layout (fused
    qkv/gateup + 2MB-tile padding for the fused decode kernels); pass
    False when per-projection leaves must survive (multi-LoRA serving)."""
    if not (load_8bit or load_4bit):
        return params
    out = dict(params)
    if load_4bit:
        from ..ops.quant import quantize_llama_params_int4

        out["llama"] = quantize_llama_params_int4(
            params["llama"], min_size=4096, inplace=True, fuse=fuse)
    else:
        from ..ops.quant import quantize_llama_params_inplace

        # leaf-at-a-time: each bf16 leaf is freed before the next one
        # quantizes — the non-inplace variant keeps the whole bf16 tree
        # alive alongside the int8 one (20GB for a 7B), which OOMs a 16GB
        # chip at the first real computation
        out["llama"] = quantize_llama_params_inplace(params["llama"],
                                                     min_size=4096,
                                                     fuse=fuse)
    return out

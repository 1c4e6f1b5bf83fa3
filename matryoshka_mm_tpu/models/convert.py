"""HF torch checkpoint -> JAX pytree conversion.

Maps the reference checkpoints (LLaVA-LLaMA + CLIP tower + projector +
router, reference: llava/model/builder.py:27-192) onto this framework's
parameter layout.  Torch is used CPU-only as a file reader; all weights
become numpy/jnp arrays.

State-dict key conventions handled:
* plain HF ``LlamaForCausalLM``:      ``model.layers.0...`` / ``lm_head...``
* LLaVA checkpoints: same plus ``model.mm_projector...``,
  ``model.vision_tower.vision_tower.vision_model...``, ``model.router...``,
  ``model.image_newline``
* standalone HF ``CLIPVisionModel``:  ``vision_model...``
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional

import numpy as np

from .clip import ClipVisionConfig
from .llama import LlamaConfig


def _np(t) -> np.ndarray:
    """torch tensor / array -> float32 numpy (bf16-safe)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        import torch

        if t.dtype == torch.bfloat16:
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def _stack(layers):
    """list of per-layer pytrees -> single pytree with leading layer axis."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)


def convert_clip_vision(sd: Mapping[str, "np.ndarray"], cfg: ClipVisionConfig,
                        prefix: str = "vision_model.") -> dict:
    """HF CLIPVisionModel state dict -> clip.py param pytree."""
    g = lambda k: _np(sd[prefix + k])
    D, P = cfg.hidden_size, cfg.patch_size

    def dense(k):
        return {"kernel": _np(sd[prefix + k + ".weight"]).T,
                "bias": _np(sd[prefix + k + ".bias"])}

    def ln(k):
        return {"weight": _np(sd[prefix + k + ".weight"]),
                "bias": _np(sd[prefix + k + ".bias"])}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        layers.append({
            "layer_norm1": ln(p + "layer_norm1"),
            "self_attn": {
                "q_proj": dense(p + "self_attn.q_proj"),
                "k_proj": dense(p + "self_attn.k_proj"),
                "v_proj": dense(p + "self_attn.v_proj"),
                "out_proj": dense(p + "self_attn.out_proj"),
            },
            "layer_norm2": ln(p + "layer_norm2"),
            "mlp": {"fc1": dense(p + "mlp.fc1"), "fc2": dense(p + "mlp.fc2")},
        })

    # conv kernel (D, 3, P, P) -> flattened matmul weights (3*P*P, D) with
    # input order (c, ph, pw) matching clip.embed_pixels' patch extraction
    conv = g("embeddings.patch_embedding.weight").reshape(D, 3 * P * P).T

    return {
        "class_embedding": g("embeddings.class_embedding"),
        "patch_embedding": conv,
        "position_embedding": g("embeddings.position_embedding.weight"),
        "pre_layrnorm": ln("pre_layrnorm"),
        "layers": _stack(layers),
        "post_layernorm": ln("post_layernorm"),
    }


def convert_llama(sd: Mapping[str, "np.ndarray"], cfg: LlamaConfig,
                  prefix: str = "") -> dict:
    """HF LlamaForCausalLM state dict -> llama.py param pytree.

    llama.py stores dense kernels in torch's native (out, in) orientation
    (see models/llama.py module docstring), so conversion is a pure rename
    — no transposes, no copies."""

    def w(k):
        return _np(sd[prefix + k])

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        layers.append({
            "input_layernorm": w(p + "input_layernorm.weight"),
            "post_attention_layernorm": w(p + "post_attention_layernorm.weight"),
            "self_attn": {
                "q_proj": w(p + "self_attn.q_proj.weight"),
                "k_proj": w(p + "self_attn.k_proj.weight"),
                "v_proj": w(p + "self_attn.v_proj.weight"),
                "o_proj": w(p + "self_attn.o_proj.weight"),
            },
            "mlp": {
                "gate_proj": w(p + "mlp.gate_proj.weight"),
                "up_proj": w(p + "mlp.up_proj.weight"),
                "down_proj": w(p + "mlp.down_proj.weight"),
            },
        })

    embed = w("model.embed_tokens.weight")
    lm = w("lm_head.weight") if prefix + "lm_head.weight" in sd else embed
    return {
        "embed_tokens": embed,
        "layers": _stack(layers),
        "norm": w("model.norm.weight"),
        "lm_head": lm,
    }


def convert_mpt(sd: Mapping[str, "np.ndarray"], cfg: LlamaConfig,
                prefix: str = "") -> dict:
    """HF MptForCausalLM state dict -> llama.py mpt-arch pytree."""

    def w(k):
        return _np(sd[prefix + k])

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.blocks.{i}."
        layers.append({
            "norm_1": w(p + "norm_1.weight"),
            "norm_2": w(p + "norm_2.weight"),
            "attn": {
                "Wqkv": w(p + "attn.Wqkv.weight"),
                "out_proj": w(p + "attn.out_proj.weight"),
            },
            "ffn": {
                "up_proj": w(p + "ffn.up_proj.weight"),
                "down_proj": w(p + "ffn.down_proj.weight"),
            },
        })
    return {
        "embed_tokens": w("transformer.wte.weight"),
        "layers": _stack(layers),
        "norm": w("transformer.norm_f.weight"),
    }


def convert_projector(sd: Mapping[str, "np.ndarray"], projector_type: str,
                      prefix: str = "model.mm_projector.") -> Optional[dict]:
    """LLaVA projector Sequential -> projector.py pytree.

    mlp2x_gelu is ``Sequential(Linear, GELU, Linear)`` so linear weights sit
    at even indices; ``linear`` is a bare Linear saved without an index.
    """
    if projector_type == "identity":
        return {}
    if prefix + "weight" in sd:  # bare nn.Linear
        return {"layers": [{"kernel": _np(sd[prefix + "weight"]).T,
                            "bias": _np(sd[prefix + "bias"])}]}
    layers = []
    idx = 0
    while f"{prefix}{idx}.weight" in sd:
        layers.append({"kernel": _np(sd[f"{prefix}{idx}.weight"]).T,
                       "bias": _np(sd[f"{prefix}{idx}.bias"])})
        idx += 2  # skip GELU modules
    if not layers:
        return None
    return {"layers": layers}


def convert_router(sd: Mapping[str, "np.ndarray"],
                   prefix: str = "model.router.") -> Optional[dict]:
    if prefix + "fc1.weight" not in sd:
        return None
    return {
        "fc1": {"kernel": _np(sd[prefix + "fc1.weight"]).T,
                "bias": _np(sd[prefix + "fc1.bias"])},
        "fc2": {"kernel": _np(sd[prefix + "fc2.weight"]).T,
                "bias": _np(sd[prefix + "fc2.bias"])},
    }


def convert_llava_checkpoint(sd: Mapping[str, "np.ndarray"], cfg) -> dict:
    """Full LLaVA state dict -> init_llava_params-compatible pytree."""
    params: Dict[str, object] = {
        "llama": convert_llama(sd, cfg.llama),
        "mm_projector": convert_projector(sd, cfg.mm_projector_type),
    }
    vt_prefix = "model.vision_tower.vision_tower.vision_model."
    if any(k.startswith(vt_prefix) for k in sd):
        params["vision_tower"] = convert_clip_vision(sd, cfg.vision, prefix=vt_prefix)
    router = convert_router(sd)
    if router is not None:
        params["router"] = router
    if "model.image_newline" in sd:
        params["image_newline"] = _np(sd["model.image_newline"])
    return params


def cast_pytree(params, dtype):
    """Cast floating leaves to dtype (e.g. bf16 for TPU serving)."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)


def merge_lora(base_sd: Dict[str, np.ndarray], lora_sd: Mapping[str, "np.ndarray"],
               scaling: float) -> Dict[str, np.ndarray]:
    """Merge LoRA A/B pairs into base weights: W += scaling * B @ A
    (reference: llava/model/builder.py:70-113 assembles LoRA checkpoints)."""
    out = dict(base_sd)
    pat = re.compile(r"(.*)\.lora_A(?:\.default)?\.weight$")
    for k in lora_sd:
        m = pat.match(k)
        if not m:
            continue
        stem = m.group(1)
        b_key = k.replace("lora_A", "lora_B")
        a = _np(lora_sd[k])
        b = _np(lora_sd[b_key])
        target = (stem + ".weight").replace("base_model.model.", "")
        if target in out:
            out[target] = out[target] + scaling * (b @ a)
    return out

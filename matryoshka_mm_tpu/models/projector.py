"""Multimodal projector: vision features -> LLM embedding space.

Supports ``linear``, ``mlp{N}x_gelu`` and ``identity``
(reference: llava/model/multimodal_projector/builder.py:33-51).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp

_MLP_GELU_RE = re.compile(r"^mlp(\d+)x_gelu$")


def projector_depth(projector_type: str) -> int:
    if projector_type == "linear":
        return 1
    if projector_type == "identity":
        return 0
    m = _MLP_GELU_RE.match(projector_type)
    if m:
        return int(m.group(1))
    raise ValueError(f"Unknown projector type: {projector_type}")


def init_projector_params(rng: jax.Array, projector_type: str,
                          mm_hidden_size: int, hidden_size: int,
                          dtype="float32") -> Optional[dict]:
    depth = projector_depth(projector_type)
    if depth == 0:
        return {}
    dtype = jnp.dtype(dtype)
    keys = jax.random.split(rng, depth)
    layers = []
    in_dim = mm_hidden_size
    for i in range(depth):
        layers.append({
            "kernel": (jax.random.normal(keys[i], (in_dim, hidden_size), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((hidden_size,), dtype),
        })
        in_dim = hidden_size
    return {"layers": layers}


def apply_projector(params: Optional[dict], projector_type: str,
                    x: jnp.ndarray) -> jnp.ndarray:
    depth = projector_depth(projector_type)
    if depth == 0:
        return x
    for i, layer in enumerate(params["layers"]):
        if i > 0:
            # torch nn.GELU() default: exact erf gelu
            x = jax.nn.gelu(x, approximate=False)
        x = x @ layer["kernel"] + layer["bias"]
    return x

"""M3-MoE scale router.

The gating network that predicts which matryoshka token scale to use per
sample (reference: llava/model/llava_arch.py:110-145 ``DenseGatingNetwork``,
``UniformGatingNetwork``; 42-53 ``ExponentialMovingAverage``).

Pure functions over a parameter pytree; the EMA buffer is explicit state
threaded through the train step (no stateful modules under jit).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def init_dense_gating_params(rng: jax.Array, embed_dim: int, num_experts: int,
                             dtype="float32") -> dict:
    dtype = jnp.dtype(dtype)
    k1, k2 = jax.random.split(rng)
    # torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))
    b1 = embed_dim ** -0.5
    b2 = embed_dim ** -0.5
    return {
        "fc1": {
            "kernel": jax.random.uniform(k1, (embed_dim, embed_dim), jnp.float32, -b1, b1).astype(dtype),
            "bias": jnp.zeros((embed_dim,), dtype),
        },
        "fc2": {
            "kernel": jax.random.uniform(k2, (embed_dim, num_experts), jnp.float32, -b2, b2).astype(dtype),
            "bias": jnp.zeros((num_experts,), dtype),
        },
    }


def dense_gating_forward(params: dict, x: jnp.ndarray,
                         dropout_rng: Optional[jax.Array] = None,
                         dropout_rate: Optional[float] = None) -> jnp.ndarray:
    """(B, D) -> (B, K) softmax gating probs in float32
    (reference: llava_arch.py:127-135)."""
    x = jnp.tanh(x @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    if dropout_rng is not None and dropout_rate:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0)
    x = x @ params["fc2"]["kernel"] + params["fc2"]["bias"]
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1)


def uniform_gating_forward(num_experts: int, x: jnp.ndarray) -> jnp.ndarray:
    B = x.shape[0]
    return jnp.full((B, num_experts), 1.0 / num_experts, jnp.float32)


def build_router_input(encode_outputs: Dict[str, jnp.ndarray],
                       feature_types, text_embed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Concat the configured feature taps (reference: llava_arch.py:499-513)."""
    parts = []
    for ft in feature_types:
        if ft == "textcls":
            if text_embed is None:
                raise ValueError("feature_type=textcls requires a text embedding")
            parts.append(text_embed)
        elif ft in encode_outputs:
            parts.append(encode_outputs[ft])
        else:
            raise ValueError(f"feature_type={ft} not available")
    return jnp.concatenate(parts, axis=1)


def ema_update(ema: Optional[jnp.ndarray], value: jnp.ndarray,
               alpha: float) -> jnp.ndarray:
    """EMA buffer update (reference: llava_arch.py:48-53).

    ``ema=None`` (first step) initializes to ``value``; callers persist the
    returned state.  Note the reference's convention: alpha weights the NEW
    value.
    """
    value = jax.lax.stop_gradient(value)
    if ema is None:
        return value
    return alpha * value + (1.0 - alpha) * ema

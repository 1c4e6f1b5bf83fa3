"""Attention dispatch.

``attention()`` is the single entry point used by every model in the
framework.  It routes to the Pallas flash-attention kernel on TPU
(ops/flash_attention.py) and to a fused-softmax jnp reference elsewhere —
the TPU-native replacement for the reference's flash-attn/xformers monkey
patches (reference: llava/train/llama_flash_attn_monkey_patch.py,
llama_xformers_attn_monkey_patch.py).

Shapes follow the TPU-friendly convention (B, H, S, Dh) with GQA via
``num_kv_heads <= num_heads``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large finite negative; -inf breaks softmax rows that are fully masked


def _expand_kv(k: jnp.ndarray, num_q_heads: int) -> jnp.ndarray:
    """Repeat kv heads for grouped-query attention."""
    num_kv = k.shape[1]
    if num_kv == num_q_heads:
        return k
    group = num_q_heads // num_kv
    return jnp.repeat(k, group, axis=1)


def attention_reference(
    q: jnp.ndarray,                       # (B, H, Sq, Dh)
    k: jnp.ndarray,                       # (B, Hkv, Sk, Dh)
    v: jnp.ndarray,                       # (B, Hkv, Sk, Dh)
    *,
    causal: bool = True,
    q_positions: Optional[jnp.ndarray] = None,   # (B, Sq) absolute positions
    kv_positions: Optional[jnp.ndarray] = None,  # (B, Sk)
    kv_valid: Optional[jnp.ndarray] = None,      # (B, Sk) bool
    bias: Optional[jnp.ndarray] = None,          # (1|B, H, Sq, Sk) e.g. alibi
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Masked multi-head attention, fp32 softmax, output in q.dtype.

    Causality is defined on absolute positions so the same code covers
    prefill (q_pos == kv_pos) and single-token decode against a KV cache
    (q_pos = current step, kv_pos = cache slots).  ``bias`` supports
    alibi-style score offsets (MPT); ``sliding_window`` restricts attention
    to the last W positions (Mistral).
    """
    B, H, Sq, Dh = q.shape
    Sk = k.shape[2]
    k = _expand_kv(k, H)
    v = _expand_kv(v, H)

    scale = Dh ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    mask = jnp.ones((B, 1, Sq, Sk), dtype=bool)
    if kv_valid is not None:
        mask &= kv_valid[:, None, None, :].astype(bool)
    if causal or sliding_window is not None:
        if q_positions is None:
            q_positions = jnp.broadcast_to(jnp.arange(Sq)[None, :], (B, Sq))
        if kv_positions is None:
            kv_positions = jnp.broadcast_to(jnp.arange(Sk)[None, :], (B, Sk))
        rel = (q_positions[:, None, :, None]
               - kv_positions[:, None, None, :])     # q_pos - kv_pos
        if causal:
            mask &= rel >= 0
        if sliding_window is not None:
            mask &= rel < sliding_window

    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    return jax.default_backend() == "tpu"


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    kv_valid: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    sliding_window: Optional[int] = None,
    q_index_offset: int = 0,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch to the fastest correct implementation.

    impl: 'auto' | 'flash' | 'reference'.  Decode steps (Sq == 1) always use
    the reference path — a single-row softmax is bandwidth-bound and XLA
    already emits an optimal fused kernel for it.  Bias (alibi) routes to
    the reference path for now.
    """
    Sq = q.shape[2]
    use_flash = (bias is None
                 and (impl == "flash"
                      or (impl == "auto" and _flash_available() and Sq > 1)))
    if use_flash:
        from .flash_attention import flash_attention

        return flash_attention(
            q, k, v, causal=causal, q_positions=q_positions,
            kv_positions=kv_positions, kv_valid=kv_valid,
            sliding_window=sliding_window, q_index_offset=q_index_offset,
        )
    return attention_reference(
        q, k, v, causal=causal, q_positions=q_positions,
        kv_positions=kv_positions, kv_valid=kv_valid, bias=bias,
        sliding_window=sliding_window,
    )

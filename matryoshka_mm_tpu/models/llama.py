"""LLaMA decoder (Vicuna-7B/13B family) in functional JAX.

TPU-native re-design of the reference's HF ``LlamaForCausalLM`` backbone
(reference: llava/model/language_model/llava_llama.py:154-176 wraps it):

* parameters are a plain pytree whose leaf names mirror the HF checkpoint
  keys, so torch->JAX weight conversion is a transpose + rename;
* the 32 decoder layers are **stacked** and executed with ``lax.scan`` —
  one compiled layer body instead of 32 unrolled copies (fast compiles,
  optional per-layer rematerialization for training memory);
* attention runs through ops.attention (Pallas flash on TPU);
* the KV cache is a fixed-capacity buffer pytree with absolute-position
  causality, so left-padded prefill + decode share one code path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attention


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    dtype: str = "bfloat16"
    remat: bool = False
    attn_impl: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def vicuna_7b(cls, **kw):
        return cls(**kw)

    @classmethod
    def vicuna_13b(cls, **kw):
        return cls(hidden_size=5120, intermediate_size=13824,
                   num_hidden_layers=40, num_attention_heads=40,
                   num_key_value_heads=40, **kw)

    @classmethod
    def tiny_debug(cls, **kw):
        """4-layer toy config for tests and CPU-mesh dry runs."""
        defaults = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=4, num_attention_heads=4,
                        num_key_value_heads=4, max_position_embeddings=512,
                        dtype="float32")
        defaults.update(kw)
        return cls(**defaults)


class KVCache(NamedTuple):
    """Fixed-capacity per-layer KV buffers (stacked over layers)."""

    k: jnp.ndarray          # (n_layers, B, S_max, n_kv, Dh)
    v: jnp.ndarray          # (n_layers, B, S_max, n_kv, Dh)
    valid: jnp.ndarray      # (B, S_max) bool — filled & attendable slots
    positions: jnp.ndarray  # (B, S_max) int32 — absolute position per slot
    write_idx: jnp.ndarray  # () int32 — next slot to fill


def init_kv_cache(cfg: LlamaConfig, batch: int, capacity: int,
                  dtype=None) -> KVCache:
    dtype = dtype or jnp.dtype(cfg.dtype)
    shape = (cfg.num_hidden_layers, batch, capacity,
             cfg.num_key_value_heads, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        valid=jnp.zeros((batch, capacity), bool),
        positions=jnp.zeros((batch, capacity), jnp.int32),
        write_idx=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_llama_params(rng: jax.Array, cfg: LlamaConfig) -> dict:
    """Random-init parameter pytree; leaf layout matches HF key names."""
    dtype = jnp.dtype(cfg.dtype)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = jax.random.split(rng, 4)

    def dense(key, in_dim, out_dim):
        # generate directly in the target dtype: avoids a full-size f32
        # intermediate per leaf (matters when initializing 7B bf16 on-chip)
        return jax.random.normal(key, (in_dim, out_dim), dtype) * jnp.asarray(0.02, dtype)

    def layer(key):
        ks = jax.random.split(key, 7)
        return {
            "input_layernorm": jnp.ones((D,), dtype),
            "post_attention_layernorm": jnp.ones((D,), dtype),
            "self_attn": {
                "q_proj": dense(ks[0], D, H * Dh),
                "k_proj": dense(ks[1], D, Hkv * Dh),
                "v_proj": dense(ks[2], D, Hkv * Dh),
                "o_proj": dense(ks[3], H * Dh, D),
            },
            "mlp": {
                "gate_proj": dense(ks[4], D, I),
                "up_proj": dense(ks[5], D, I),
                "down_proj": dense(ks[6], I, D),
            },
        }

    layer_keys = jax.random.split(keys[0], cfg.num_hidden_layers)
    layers = jax.vmap(layer)(layer_keys)  # stacked: every leaf has leading n_layers
    return {
        "embed_tokens": dense(keys[1], cfg.vocab_size, D),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "lm_head": dense(keys[2], D, cfg.vocab_size),
    }


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, S) int positions -> cos/sin of shape (B, S, Dh/2)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (B, S, Dh/2)
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate (B, H, S, Dh) by per-(B,S) cos/sin, HF rotate-half convention."""
    Dh = x.shape[-1]
    x1, x2 = x[..., : Dh // 2], x[..., Dh // 2:]
    cos = cos[:, None, :, :]  # (B, 1, S, Dh/2)
    sin = sin[:, None, :, :]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def embed_tokens(params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup; negative sentinel ids are clamped (rows are
    overwritten by the splice so their value never matters)."""
    ids = jnp.clip(input_ids, 0, params["embed_tokens"].shape[0] - 1)
    return params["embed_tokens"][ids]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _layer_forward(layer_params, hidden, *, cfg: LlamaConfig, cos, sin,
                   q_positions, kv_valid, kv_positions,
                   cache_k, cache_v, write_idx):
    """One decoder layer.  cache_k/v: (B, S_max, n_kv, Dh) or None."""
    B, S, D = hidden.shape
    H, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    a = layer_params["self_attn"]

    x = rms_norm(hidden, layer_params["input_layernorm"], cfg.rms_norm_eps)
    q = (x @ a["q_proj"]).reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    k = (x @ a["k_proj"]).reshape(B, S, Hkv, Dh).transpose(0, 2, 1, 3)
    v = (x @ a["v_proj"]).reshape(B, S, Hkv, Dh).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_k is not None:
        # Write the S new entries at slots [write_idx, write_idx + S).
        k_slots = k.transpose(0, 2, 1, 3)  # (B, S, Hkv, Dh)
        v_slots = v.transpose(0, 2, 1, 3)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_slots.astype(cache_k.dtype), (0, write_idx, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_slots.astype(cache_v.dtype), (0, write_idx, 0, 0))
        attn_k = cache_k.transpose(0, 2, 1, 3)  # (B, Hkv, S_max, Dh)
        attn_v = cache_v.transpose(0, 2, 1, 3)
        attn_out = attention(
            q, attn_k, attn_v, causal=True, q_positions=q_positions,
            kv_positions=kv_positions, kv_valid=kv_valid, impl=cfg.attn_impl)
    else:
        attn_out = attention(
            q, k, v, causal=True, q_positions=q_positions,
            kv_positions=q_positions, kv_valid=kv_valid, impl=cfg.attn_impl)

    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
    hidden = hidden + attn_out @ a["o_proj"]

    x = rms_norm(hidden, layer_params["post_attention_layernorm"], cfg.rms_norm_eps)
    m = layer_params["mlp"]
    gate = jax.nn.silu(x @ m["gate_proj"])
    hidden = hidden + (gate * (x @ m["up_proj"])) @ m["down_proj"]
    return hidden, (cache_k, cache_v)


def llama_forward(
    params: dict,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,                 # (B, S, D)
    *,
    position_ids: jnp.ndarray,                  # (B, S)
    attn_valid: Optional[jnp.ndarray] = None,   # (B, S) bool
    cache: Optional[KVCache] = None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack.  Returns (hidden_states, updated_cache).

    Without a cache: standard causal self-attention over the S tokens.
    With a cache: the S tokens are appended at ``cache.write_idx`` and
    attend over the whole cache (prefill S>1 and decode S==1 use the same
    path).
    """
    B, S, D = inputs_embeds.shape
    if attn_valid is None:
        attn_valid = jnp.ones((B, S), bool)
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)

    hidden = inputs_embeds
    if cache is None:
        def body(h, layer_params):
            h, _ = _layer_forward(
                layer_params, h, cfg=cfg, cos=cos, sin=sin,
                q_positions=position_ids, kv_valid=attn_valid,
                kv_positions=None, cache_k=None, cache_v=None, write_idx=None)
            return h, None

        if cfg.remat:
            body = jax.checkpoint(body)
        hidden, _ = jax.lax.scan(body, hidden, params["layers"])
        new_cache = None
    else:
        write_idx = cache.write_idx
        # Slot bookkeeping is layer-independent: compute once.
        new_valid = jax.lax.dynamic_update_slice(
            cache.valid, attn_valid, (0, write_idx))
        new_positions = jax.lax.dynamic_update_slice(
            cache.positions, position_ids.astype(jnp.int32), (0, write_idx))

        def body(h, xs):
            layer_params, ck, cv = xs
            h, (ck, cv) = _layer_forward(
                layer_params, h, cfg=cfg, cos=cos, sin=sin,
                q_positions=position_ids, kv_valid=new_valid,
                kv_positions=new_positions, cache_k=ck, cache_v=cv,
                write_idx=write_idx)
            return h, (ck, cv)

        hidden, (new_k, new_v) = jax.lax.scan(
            body, hidden, (params["layers"], cache.k, cache.v))
        new_cache = KVCache(new_k, new_v, new_valid, new_positions,
                            write_idx + S)

    hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
    return hidden, new_cache


def lm_head(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project to vocab logits in float32 (reference: llava_llama.py:239-240)."""
    return (hidden @ params["lm_head"]).astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def llama_logits(params: dict, cfg: LlamaConfig, input_ids: jnp.ndarray,
                 position_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Convenience text-only forward: ids -> logits."""
    if position_ids is None:
        B, S = input_ids.shape
        position_ids = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    h = embed_tokens(params, input_ids)
    h, _ = llama_forward(params, cfg, h, position_ids=position_ids)
    return lm_head(params, h)

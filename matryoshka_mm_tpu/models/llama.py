"""LLaMA decoder (Vicuna-7B/13B family) in functional JAX.

TPU-native re-design of the reference's HF ``LlamaForCausalLM`` backbone
(reference: llava/model/language_model/llava_llama.py:154-176 wraps it):

* parameters are a plain pytree whose leaf names mirror the HF checkpoint
  keys; dense kernels keep torch's native ``(out, in)`` orientation and
  every projection contracts last-dim-vs-last-dim (:func:`proj`).  This is
  not just converter convenience: with ``(in, out)`` storage XLA's layout
  assignment cannot propagate the narrow-batch GEMM's preferred (transposed)
  layout across a ``lax.scan``-over-steps boundary and hoists multi-GB
  layout-converted copies of the stacked weights out of the decode loop
  (measured: 385MB of temps at L=4/7B-width vs 0 with (out, in) storage,
  and ~10% faster decode steps);
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
from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import attention
from ..ops.quant import (dequantize_array as _w, fused_int4_proj,
                         fused_quant_mlp, index_layer_tree, tree_has_int4)


def _flash_decode_ok(impl: str, head_dim: int, batch: int,
                     quantized: bool, capacity: int = 0) -> bool:
    """Route Sq==1 cached attention through ops/decode_attention.py on TPU
    ('auto'); impl='reference'/'flash' keep the XLA path for parity runs.

    Two hardware gates (both measured on v5e, 7B):
    - Mosaic can't slice the 128-lane dim, so head_dim must be 128-aligned
      (tiny debug configs fall back to the XLA path);
    - in the bf16 B=1 decode graph, XLA's buffer assignment inserts a
      per-layer copy of one full stacked cache buffer when it feeds a
      custom call (profiled: copy-done 3.3 ms/token = 32 x 84 MB at HBM
      speed), erasing the kernel's gain (53 -> 38 tok/s).  The B>=2 and
      quantized-weight graphs alias cleanly and keep the win (b4 +3%,
      int8/int4 b8 +16/+21%), so bf16 b1 stays on the XLA pair.

    ``capacity`` guards the kernel's KV-axis blocking: an odd cache length
    (e.g. max_new_tokens=100 on a 64-aligned prompt region) has no
    lane-aligned block divisor, which would raise at trace time inside
    the kernel — fall back to the XLA path instead of crashing decode."""
    if capacity:
        from ..ops.decode_attention import _pick_bs

        if _pick_bs(capacity) == 0:
            return False
    return (impl == "auto" and head_dim % 128 == 0
            and (batch >= 2 or quantized)
            and jax.default_backend() == "tpu")


def proj(x: jnp.ndarray, leaf) -> jnp.ndarray:
    """``x (..., in)`` times a weight leaf stored ``(out, in)`` -> ``(..., out)``.

    The single matmul entry point for every llama dense kernel (plain,
    int8/int4-quantized, or LoRA-wrapped — ``dequantize_array`` resolves
    all three).  Contracting last-vs-last keeps the stored layout the one
    the decode loop's narrow GEMMs want, so no relayout copies are hoisted
    out of ``lax.scan`` (see module docstring).

    int4 leaves with decode-sized row counts take the fused Pallas
    dequant-matmul (ops/int4_matmul.py) instead of materializing bf16
    weights in HBM."""
    if isinstance(leaf, dict):
        y = fused_int4_proj(x, leaf)
        if y is not None:
            return y
    w = _w(leaf)
    dt = jnp.promote_types(x.dtype, w.dtype)
    return jax.lax.dot_general(
        x.astype(dt), w.astype(dt),
        (((x.ndim - 1,), (w.ndim - 1,)), ((), ())))


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Decoder config covering the three LLM families the reference wraps
    (reference: llava/model/language_model/llava_llama.py, llava_mistral.py,
    llava_mpt.py): ``arch='llama'`` (RoPE + SwiGLU), ``'mistral'`` (same +
    GQA + sliding window), ``'mpt'`` (alibi + fused qkv + GELU MLP, no
    biasless LayerNorm, tied embeddings)."""

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
    # rematerialization policy for the training-mode layer scan when
    # ``remat`` is set.  "" = full remat (save only layer boundaries,
    # recompute everything in the backward — minimum memory).
    # "dots" = jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
    # matmul outputs are saved, the backward recomputes only the cheap
    # elementwise tail (norms/rope/activations) — costs ~2 bytes/param-row
    # of extra activation memory per layer, skips most recompute FLOPs.
    # "names:<tag,...>" = save_only_these_names over checkpoint_name tags
    # (attn_q/attn_k/attn_v/attn_o at the layer level, flash_out/flash_lse
    # inside the flash fwd rule); "names:attn" = all six — the backward
    # skips the qkv/o projections and the O(T^2) flash forward but still
    # recomputes the wide gate/up MLP intermediates (~20KB/token/layer
    # saved vs "dots"'s ~55KB, which OOMs at the K=5/T=2048 bench shape).
    remat_policy: str = ""
    attn_impl: str = "auto"
    arch: str = "llama"
    sliding_window: int = 0          # 0 = disabled
    tie_word_embeddings: bool = False
    # "int8": KV slots stored int8 with a per-(slot, kv-head) absmax scale
    # — halves attention reads and doubles cache capacity; "" follows
    # `dtype`.  Opt-in (load_pretrained_model(kv_cache_dtype="int8")).
    kv_cache_dtype: str = ""
    # Tensor-parallel execution under shard_map (parallel/tp_decode.py):
    # the per-device local config scales num_attention_heads /
    # num_key_value_heads by 1/tp, pins head_dim via ``head_dim_override``
    # (the hidden_size//heads derivation breaks on local head counts) and
    # names the mesh axis here so the layer body psums the K-sharded
    # o_proj/down_proj partial products.  "" = single-device (no-op).
    tp_axis: str = ""
    head_dim_override: int = 0

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or \
            self.hidden_size // self.num_attention_heads

    @classmethod
    def vicuna_7b(cls, **kw):
        return cls(**kw)

    @classmethod
    def vicuna_13b(cls, **kw):
        return cls(hidden_size=5120, intermediate_size=13824,
                   num_hidden_layers=40, num_attention_heads=40,
                   num_key_value_heads=40, **kw)

    @classmethod
    def mistral_7b(cls, **kw):
        return cls(arch="mistral", intermediate_size=14336,
                   num_key_value_heads=8, sliding_window=4096,
                   rms_norm_eps=1e-6, rope_theta=1e6,
                   max_position_embeddings=32768, **kw)

    @classmethod
    def mpt_7b(cls, **kw):
        return cls(arch="mpt", vocab_size=50432, intermediate_size=16384,
                   max_position_embeddings=2048, tie_word_embeddings=True,
                   **kw)

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
    """Fixed-capacity per-layer KV buffers (stacked over layers).

    With ``kv_cache_dtype='int8'`` the k/v buffers hold int8 values and
    ``k_scale``/``v_scale`` the per-(layer, batch, slot, kv-head) absmax
    dequantization scales; bf16 caches leave the scales None.

    The scale buffers are stored FLAT — ``(n_layers, B, S_max * n_kv)``
    with flat index ``slot * n_kv + head`` — for the same reason the
    paged pools' scales are (serve/paged_cache.PagedKVCache): the flash
    decode kernel consumes lane-aligned flat scale blocks, and with 4-D
    storage XLA materialized a layout-converting copy of both full scale
    buffers every decode layer (~2.9 ms/step at 7B b8 — the entire
    measured "int8-KV throughput cost" of round 4).  Flat 3-D storage
    shares one natural layout between the slot writes and the kernel
    operands.  Under tensor parallelism the flat axis is sharded
    contiguously per device (parallel/tp_decode._cache_spec); the global
    array is then shard-major rather than slot-major, which is fine —
    only the same shard_mapped functions ever consume it."""

    k: jnp.ndarray          # (n_layers, B, S_max, n_kv, Dh)
    v: jnp.ndarray          # (n_layers, B, S_max, n_kv, Dh)
    valid: jnp.ndarray      # (B, S_max) bool — filled & attendable slots
    positions: jnp.ndarray  # (B, S_max) int32 — absolute position per slot
    write_idx: jnp.ndarray  # () int32 — next slot to fill
    k_scale: Optional[jnp.ndarray] = None   # (n_layers, B, S_max*n_kv) f32
    v_scale: Optional[jnp.ndarray] = None


def init_kv_cache(cfg: LlamaConfig, batch: int, capacity: int,
                  dtype=None) -> KVCache:
    dtype = dtype or (jnp.int8 if cfg.kv_cache_dtype == "int8"
                      else jnp.dtype(cfg.dtype))
    shape = (cfg.num_hidden_layers, batch, capacity,
             cfg.num_key_value_heads, cfg.head_dim)
    int8 = jnp.dtype(dtype) == jnp.int8
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        valid=jnp.zeros((batch, capacity), bool),
        positions=jnp.zeros((batch, capacity), jnp.int32),
        write_idx=jnp.zeros((), jnp.int32),
        k_scale=(jnp.zeros((shape[0], batch,
                            capacity * cfg.num_key_value_heads), jnp.float32)
                 if int8 else None),
        v_scale=(jnp.zeros((shape[0], batch,
                            capacity * cfg.num_key_value_heads), jnp.float32)
                 if int8 else None),
    )


def _quantize_kv_slots(x: jnp.ndarray):
    """(1, B, S, n_kv, Dh) float -> int8 values + (1, B, S, n_kv) f32
    per-(slot, head) absmax scale."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


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
        # stored (out, in), torch Linear orientation (see module docstring);
        # generated directly in the target dtype: avoids a full-size f32
        # intermediate per leaf (matters when initializing 7B bf16 on-chip)
        return jax.random.normal(key, (out_dim, in_dim), dtype) * jnp.asarray(0.02, dtype)

    if cfg.arch == "mpt":
        def layer(key):
            ks = jax.random.split(key, 4)
            return {
                "norm_1": jnp.ones((D,), dtype),
                "norm_2": jnp.ones((D,), dtype),
                "attn": {
                    "Wqkv": dense(ks[0], D, 3 * D),
                    "out_proj": dense(ks[1], D, D),
                },
                "ffn": {
                    "up_proj": dense(ks[2], D, I),
                    "down_proj": dense(ks[3], I, D),
                },
            }

        layers = jax.vmap(layer)(jax.random.split(keys[0], cfg.num_hidden_layers))
        return {
            # embedding table is (vocab, D) — feeds a gather, and doubles
            # as the tied lm head ((out=vocab, in=D) is already proj's
            # orientation, so tying needs no transpose)
            "embed_tokens": dense(keys[1], D, cfg.vocab_size),
            "layers": layers,
            "norm": jnp.ones((D,), dtype),
        }

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
        "embed_tokens": dense(keys[1], D, cfg.vocab_size),  # (vocab, D): gather
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "lm_head": dense(keys[2], D, cfg.vocab_size),       # (vocab, D)
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


def layer_norm_nobias(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Bias-free LayerNorm (MPT's LPLayerNorm with no_bias=True)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def alibi_slopes(num_heads: int, alibi_bias_max: float = 8.0) -> jnp.ndarray:
    """(H,) alibi slopes, MPT convention (power-of-two interleaving)."""
    import math

    n = 2 ** math.ceil(math.log2(num_heads))
    m = jnp.arange(1, n + 1, dtype=jnp.float32)
    m = m * (alibi_bias_max / n)
    slopes = 1.0 / jnp.exp2(m)
    if n != num_heads:
        # interleave: odd-indexed first, then even (standard alibi recipe)
        slopes = jnp.concatenate([slopes[1::2], slopes[0::2]])[:num_heads]
    return slopes


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
                   cache_k, cache_v, write_idx, layer_idx=None,
                   q_index_offset: int = 0, cache_ks=None, cache_vs=None):
    """One decoder layer.

    ``cache_k/v`` are the FULL stacked buffers ``(L, B, S_max, n_kv, Dh)``
    (or None) and ``layer_idx`` selects this layer's slice.  The new slots
    are written in place into the stacked buffer (a tiny
    dynamic_update_slice the carry aliasing keeps copy-free) and only this
    layer's slice is read back for attention — see llama_forward."""
    if cfg.arch == "mpt":
        h, (cache_k, cache_v, cache_ks, cache_vs) = _mpt_layer_forward(
            layer_params, hidden, cfg=cfg, q_positions=q_positions,
            kv_valid=kv_valid, kv_positions=kv_positions,
            cache_k=cache_k, cache_v=cache_v, write_idx=write_idx,
            layer_idx=layer_idx, cache_ks=cache_ks, cache_vs=cache_vs)
        return h, (cache_k, cache_v, cache_ks, cache_vs)

    B, S, D = hidden.shape
    H, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    a = layer_params["self_attn"]
    window = cfg.sliding_window or None

    x = rms_norm(hidden, layer_params["input_layernorm"], cfg.rms_norm_eps)
    if "qkv_proj" in a:
        # int4 fused layout (ops/quant.py _fuse_layer_projections):
        # one kernel launch for q+k+v instead of three
        qkv = proj(x, a["qkv_proj"])
        q, k, v = jnp.split(qkv, [H * Dh, H * Dh + Hkv * Dh], axis=-1)
    else:
        q = proj(x, a["q_proj"])
        k = proj(x, a["k_proj"])
        v = proj(x, a["v_proj"])
    q = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, Hkv, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, Hkv, Dh).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if cache_k is None:
        # Name the attention-side dot outputs for the selective remat
        # policy (remat_policy="names:...") — saving q/k/v (and o below)
        # lets the rematted backward skip re-running the qkv projections
        # while the wide gate/up MLP intermediates still recompute.
        # ~20KB/token/layer in bf16 vs ~55KB for the full dots policy,
        # which OOMs at the bench shape (B=2, T=2048, K=5 scales).
        # Identity outside such a policy (incl. the cache/decode path,
        # which never hits this branch).
        q = checkpoint_name(q, "attn_q")
        k = checkpoint_name(k, "attn_k")
        v = checkpoint_name(v, "attn_v")

    if cache_k is not None:
        li = jnp.asarray(layer_idx, jnp.int32)
        kv_int8 = cache_k.dtype == jnp.int8
        from ..ops.quant import tree_has_quantized

        # recursing-quantized, not isinstance-dict: a bf16 LoRA wrapper is
        # also a dict leaf (see gate doc); a LoRA-wrapped *quantized* base
        # still routes flash
        quantized = any(isinstance(a.get(kk), dict)
                        and tree_has_quantized(a[kk])
                        for kk in ("qkv_proj", "q_proj"))
        # Write the S new entries at slots [write_idx, write_idx + S) of
        # layer `layer_idx` in the stacked buffer (in place), then read
        # back only this layer's slice for attention.
        k_slots = k.transpose(0, 2, 1, 3)[None]  # (1, B, S, Hkv, Dh)
        v_slots = v.transpose(0, 2, 1, 3)[None]
        if kv_int8:
            k_slots, ks_slots = _quantize_kv_slots(k_slots)
            v_slots, vs_slots = _quantize_kv_slots(v_slots)
            # flat (slot*n_kv+head) scale storage — see KVCache; the S
            # new slots' scales are contiguous in the flat axis
            n_kv = ks_slots.shape[3]
            cache_ks = jax.lax.dynamic_update_slice(
                cache_ks, ks_slots.reshape(1, B, S * n_kv),
                (li, 0, write_idx * n_kv))
            cache_vs = jax.lax.dynamic_update_slice(
                cache_vs, vs_slots.reshape(1, B, S * n_kv),
                (li, 0, write_idx * n_kv))
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_slots.astype(cache_k.dtype), (li, 0, write_idx, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_slots.astype(cache_v.dtype), (li, 0, write_idx, 0, 0))
        if S == 1 and _flash_decode_ok(cfg.attn_impl, Dh, B,
                                       quantized or kv_int8,
                                       capacity=cache_k.shape[2]):
            # single-token decode: the Pallas flash-decode kernel reads
            # THIS layer's cache blocks straight out of the stacked
            # buffer (scalar-prefetched index) in the native
            # (B, S, Hkv, Dh) layout — no slice materialization, one
            # cache read (XLA's fused QK/PV pair reads it twice at
            # ~450 GB/s plus a 300us/token slice copy if pre-sliced)
            from ..ops.decode_attention import flash_decode_attention_stacked

            attn_out = flash_decode_attention_stacked(
                q[:, :, 0, :], cache_k, cache_v, li, kv_valid,
                kv_positions, q_positions[:, 0],
                sliding_window=window, k_scale=cache_ks,
                v_scale=cache_vs)[:, :, None, :]
        else:
            ck = jax.lax.dynamic_index_in_dim(cache_k, li, 0,
                                              keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cache_v, li, 0,
                                              keepdims=False)
            if kv_int8:
                # dequantize this layer's slice for the XLA path (prefill
                # is compute-bound; the extra bf16 materialization is in
                # the noise there).  Flat scales reshape back to
                # (B, S, n_kv) — a bitcast.
                cks = jax.lax.dynamic_index_in_dim(cache_ks, li, 0,
                                                   keepdims=False)
                cvs = jax.lax.dynamic_index_in_dim(cache_vs, li, 0,
                                                   keepdims=False)
                cks = cks.reshape(ck.shape[:3])
                cvs = cvs.reshape(cv.shape[:3])
                ck = (ck.astype(jnp.float32)
                      * cks[..., None]).astype(hidden.dtype)
                cv = (cv.astype(jnp.float32)
                      * cvs[..., None]).astype(hidden.dtype)
            attn_k = ck.transpose(0, 2, 1, 3)  # (B, Hkv, S_max, Dh)
            attn_v = cv.transpose(0, 2, 1, 3)
            attn_out = attention(
                q, attn_k, attn_v, causal=True, q_positions=q_positions,
                kv_positions=kv_positions, kv_valid=kv_valid,
                sliding_window=window, q_index_offset=q_index_offset,
                impl=cfg.attn_impl)
    else:
        attn_out = attention(
            q, k, v, causal=True, q_positions=q_positions,
            kv_positions=q_positions, kv_valid=kv_valid,
            sliding_window=window, impl=cfg.attn_impl)

    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
    m = layer_params["mlp"]
    # Tensor-parallel (cfg.tp_axis under shard_map): o_proj/down_proj
    # contract over the sharded head/ffn dim, so their outputs are partial
    # sums — psum before the residual add.  The whole-MLP fusion composes
    # fine (its partial output psums before the residual).
    o_out = proj(attn_out, a["o_proj"])
    if cfg.tp_axis:
        o_out = jax.lax.psum(o_out, cfg.tp_axis)
    if cache_k is None:
        # post-psum so the collective itself is not re-run in the backward
        o_out = checkpoint_name(o_out, "attn_o")
    hidden = hidden + o_out

    x = rms_norm(hidden, layer_params["post_attention_layernorm"], cfg.rms_norm_eps)
    mlp_out = fused_quant_mlp(x, m)   # whole-MLP single-kernel decode path
    if mlp_out is None:
        if "gateup_proj" in m:
            gate_up = proj(x, m["gateup_proj"])
            gate, up = jnp.split(gate_up, 2, axis=-1)
        else:
            gate = proj(x, m["gate_proj"])
            up = proj(x, m["up_proj"])
        mlp_out = proj(jax.nn.silu(gate) * up, m["down_proj"])
    if cfg.tp_axis:
        mlp_out = jax.lax.psum(mlp_out, cfg.tp_axis)
    hidden = hidden + mlp_out
    return hidden, (cache_k, cache_v, cache_ks, cache_vs)


def _mpt_layer_forward(layer_params, hidden, *, cfg: LlamaConfig,
                       q_positions, kv_valid, kv_positions,
                       cache_k, cache_v, write_idx, layer_idx=None,
                       cache_ks=None, cache_vs=None):
    """MPT block: bias-free LN, fused qkv, alibi attention, GELU MLP
    (reference model family: llava/model/language_model/llava_mpt.py).
    int8 KV caches quantize/dequantize per slot exactly like the llama
    path — a raw astype would truncate bf16 values to int8 silently."""
    B, S, D = hidden.shape
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    a = layer_params["attn"]

    x = layer_norm_nobias(hidden, layer_params["norm_1"], 1e-5)
    qkv = proj(x, a["Wqkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

    slopes = alibi_slopes(H)                                  # (H,)

    if cache_k is not None:
        li = jnp.asarray(layer_idx, jnp.int32)
        k_slots = k.transpose(0, 2, 1, 3)[None]      # (1, B, S, H, Dh)
        v_slots = v.transpose(0, 2, 1, 3)[None]
        kv_int8 = cache_k.dtype == jnp.int8
        if kv_int8:
            k_slots, ks_slots = _quantize_kv_slots(k_slots)
            v_slots, vs_slots = _quantize_kv_slots(v_slots)
            # flat (slot*n_kv+head) scale storage — see KVCache
            cache_ks = jax.lax.dynamic_update_slice(
                cache_ks, ks_slots.reshape(1, B, S * H),
                (li, 0, write_idx * H))
            cache_vs = jax.lax.dynamic_update_slice(
                cache_vs, vs_slots.reshape(1, B, S * H),
                (li, 0, write_idx * H))
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_slots.astype(cache_k.dtype), (li, 0, write_idx, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_slots.astype(cache_v.dtype), (li, 0, write_idx, 0, 0))
        ck = jax.lax.dynamic_index_in_dim(cache_k, li, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(cache_v, li, 0, keepdims=False)
        if kv_int8:
            cks = jax.lax.dynamic_index_in_dim(cache_ks, li, 0,
                                               keepdims=False).reshape(
                                                   ck.shape[:3])
            cvs = jax.lax.dynamic_index_in_dim(cache_vs, li, 0,
                                               keepdims=False).reshape(
                                                   cv.shape[:3])
            ck = (ck.astype(jnp.float32)
                  * cks[..., None]).astype(hidden.dtype)
            cv = (cv.astype(jnp.float32)
                  * cvs[..., None]).astype(hidden.dtype)
        attn_k = ck.transpose(0, 2, 1, 3)
        attn_v = cv.transpose(0, 2, 1, 3)
        kvp = kv_positions
    else:
        attn_k, attn_v = k, v
        kvp = q_positions

    # alibi bias = -slope * (q_pos - kv_pos); future positions are masked
    rel = (q_positions[:, None, :, None] - kvp[:, None, None, :]).astype(jnp.float32)
    bias = -slopes[None, :, None, None] * jnp.maximum(rel, 0)

    attn_out = attention(
        q, attn_k, attn_v, causal=True, q_positions=q_positions,
        kv_positions=kvp, kv_valid=kv_valid, bias=bias, impl="reference")
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, S, D)
    hidden = hidden + proj(attn_out, a["out_proj"])

    x = layer_norm_nobias(hidden, layer_params["norm_2"], 1e-5)
    f = layer_params["ffn"]
    hidden = hidden + proj(jax.nn.gelu(proj(x, f["up_proj"]),
                                       approximate=False), f["down_proj"])
    return hidden, (cache_k, cache_v, cache_ks, cache_vs)


def llama_forward(
    params: dict,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,                 # (B, S, D)
    *,
    position_ids: jnp.ndarray,                  # (B, S)
    attn_valid: Optional[jnp.ndarray] = None,   # (B, S) bool
    cache: Optional[KVCache] = None,
    q_index_offset: int = 0,                    # static: for chunked prefill
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
    # int4-packed layers scan over LAYER INDICES with the stacked weights
    # bound whole: slicing an int4 leaf before its pallas kernel would make
    # XLA materialize the slice — a full extra HBM read+write per layer
    # (ops/int4_matmul.py int4_matmul_stacked).  XLA-only leaves (bf16,
    # int8, LoRA) are sliced per layer, which fuses copy-free.
    stacked_int4 = tree_has_int4(params["layers"])
    if cache is None:
        if stacked_int4:
            def body(h, idx):
                lp = index_layer_tree(params["layers"], idx)
                h, _ = _layer_forward(
                    lp, h, cfg=cfg, cos=cos, sin=sin,
                    q_positions=position_ids, kv_valid=attn_valid,
                    kv_positions=None, cache_k=None, cache_v=None,
                    write_idx=None)
                return h, None

            xs = jnp.arange(cfg.num_hidden_layers)
        else:
            def body(h, layer_params):
                h, _ = _layer_forward(
                    layer_params, h, cfg=cfg, cos=cos, sin=sin,
                    q_positions=position_ids, kv_valid=attn_valid,
                    kv_positions=None, cache_k=None, cache_v=None,
                    write_idx=None)
                return h, None

            xs = params["layers"]
        if cfg.remat:
            if cfg.remat_policy == "dots":
                body = jax.checkpoint(
                    body, policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable)
            elif cfg.remat_policy.startswith("names:"):
                # selective remat: save only the listed checkpoint_name
                # tags (see _layer_forward "attn_*" and the flash fwd
                # rule's "flash_out"/"flash_lse").  "names:attn" is
                # shorthand for the full attention-side set.
                names = cfg.remat_policy[len("names:"):]
                if names == "attn":
                    names = "attn_q,attn_k,attn_v,attn_o,flash_out,flash_lse"
                body = jax.checkpoint(
                    body, policy=jax.checkpoint_policies
                    .save_only_these_names(*names.split(",")))
            elif cfg.remat_policy:
                raise ValueError(
                    f"unknown remat_policy={cfg.remat_policy!r} "
                    f"(expected '', 'dots', or 'names:<tag,...>')")
            else:
                body = jax.checkpoint(body)
        hidden, _ = jax.lax.scan(body, hidden, xs)
        new_cache = None
    else:
        write_idx = cache.write_idx
        # Slot bookkeeping is layer-independent: compute once.
        new_valid = jax.lax.dynamic_update_slice(
            cache.valid, attn_valid, (0, write_idx))
        new_positions = jax.lax.dynamic_update_slice(
            cache.positions, position_ids.astype(jnp.int32), (0, write_idx))

        # The stacked KV buffers ride the scan CARRY, not xs/ys: each layer
        # writes its tiny new-slot slice in place and reads back only its
        # own (B, S_max, ...) slice.  The previous xs/ys form made lax.scan
        # re-stack the full multi-hundred-MB cache into fresh arrays every
        # step (~0.4 ms/token of pure copy at 7B decode).
        def body(carry, xs):
            h, k_all, v_all, ks_all, vs_all = carry
            if stacked_int4:
                idx = xs
                layer_params = index_layer_tree(params["layers"], idx)
            else:
                idx, layer_params = xs
            h, (k_all, v_all, ks_all, vs_all) = _layer_forward(
                layer_params, h, cfg=cfg, cos=cos, sin=sin,
                q_positions=position_ids, kv_valid=new_valid,
                kv_positions=new_positions, cache_k=k_all, cache_v=v_all,
                write_idx=write_idx, layer_idx=idx,
                q_index_offset=q_index_offset, cache_ks=ks_all,
                cache_vs=vs_all)
            return (h, k_all, v_all, ks_all, vs_all), None

        layer_ids = jnp.arange(cfg.num_hidden_layers)
        layer_xs = (layer_ids if stacked_int4
                    else (layer_ids, params["layers"]))
        (hidden, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
            body, (hidden, cache.k, cache.v, cache.k_scale, cache.v_scale),
            layer_xs)
        new_cache = KVCache(new_k, new_v, new_valid, new_positions,
                            write_idx + S, new_ks, new_vs)

    if cfg.arch == "mpt":
        hidden = layer_norm_nobias(hidden, params["norm"], 1e-5)
    else:
        hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
    return hidden, new_cache


def lm_head(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project to vocab logits in float32 (reference: llava_llama.py:239-240).
    MPT ties the head to the embedding matrix — (vocab, D) is already the
    (out, in) orientation :func:`proj` wants, no transpose."""
    return proj(hidden, params.get("lm_head", params["embed_tokens"])
                ).astype(jnp.float32)


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

"""Weight-only int8 quantization.

TPU-native replacement for the reference's bitsandbytes 4/8-bit loading
(reference: llava/model/builder.py:51-60, ``load_8bit/load_4bit``).
Per-output-channel symmetric int8: a 7B LLaMA drops from ~13.5GB bf16 to
~6.8GB; weights dequantize per-layer inside the ``lax.scan`` decoder body,
so peak HBM is int8 weights + one bf16 layer.

Weight leaves are stored ``(..., out, in)`` (torch Linear orientation,
see models/llama.py); the reduction/input dim is the LAST axis, so the
per-output-channel scale reduces over axis -1 and int4 packs value pairs
along axis -1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QKEY = "qint8"


def _quantize_2d(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return {QKEY: q, "scale": scale.astype(jnp.float32)}


@jax.jit
def _quantize_2d_jit(w):
    return _quantize_2d(w)


@jax.jit
def _quantize_stacked(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Quantize a (n, in, out) stacked leaf slice-by-slice inside one jit:
    the f32 intermediate is per-slice and the int8 outputs update in place
    (a 2.8GB bf16 leaf would otherwise need a 5.6GB f32 copy — fatal with
    a 7B resident in HBM)."""
    n = w.shape[0]

    def body(i, carry):
        q, scale = carry
        part = _quantize_2d(w[i])
        return (q.at[i].set(part[QKEY]), scale.at[i].set(part["scale"]))

    q0 = jnp.zeros(w.shape, jnp.int8)
    s0 = jnp.zeros(w.shape[:-1] + (1,), jnp.float32)
    q, scale = jax.lax.fori_loop(0, n, body, (q0, s0))
    return {QKEY: q, "scale": scale}


def quantize_array(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(…, out, in) float -> int8 values + per-output-channel f32 scale."""
    w = jnp.asarray(w)
    if w.ndim <= 2:
        return _quantize_2d(w)
    return dict(_quantize_stacked(w))


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and (QKEY in leaf or "qint4" in leaf)


def tree_has_quantized(tree) -> bool:
    """True when any leaf of the (sub)tree is a quantized (int8/int4)
    dict — such trees scan over layer indices so the fused kernels see
    the stacked weights unsliced."""
    if isinstance(tree, dict):
        return (Q4KEY in tree or QKEY in tree
                or any(tree_has_quantized(v) for v in tree.values()))
    return False


# kept as an alias for earlier call sites
tree_has_int4 = tree_has_quantized


def index_layer_tree(tree, idx):
    """Per-layer view of a stacked layer tree for a scan over layer
    indices.  Quantized leaves stay whole (the fused kernel selects the
    layer via scalar prefetch — slicing them before a pallas call would
    materialize a copy); every other leaf is sliced, which XLA fuses into
    its consumers copy-free."""
    if isinstance(tree, dict):
        if Q4KEY in tree or QKEY in tree:
            return {**tree, "_layer": idx}
        return {k: index_layer_tree(v, idx) for k, v in tree.items()}
    return tree[idx]


def dequantize_array(leaf, dtype=jnp.bfloat16) -> jnp.ndarray:
    if isinstance(leaf, dict) and "lora_a" in leaf:
        # LoRA wrapper (ops/lora.py): frozen base + trainable low-rank
        # delta, resolved per-layer inside the decoder scan.  The base is
        # stop-gradiented: only A/B receive grads.  peft-native shapes:
        # A (.., r, in), B (.., out, r), delta = B @ A -> (out, in).
        base = jax.lax.stop_gradient(dequantize_array(leaf["w"], dtype))
        delta = (leaf["lora_b"] @ leaf["lora_a"]) * leaf["lora_scale"]
        return base + delta.astype(base.dtype)
    if not is_quantized(leaf):
        return leaf
    if "qint4" in leaf:
        if "_layer" in leaf:        # stacked layer view (index_layer_tree)
            leaf = {Q4KEY: leaf[Q4KEY][leaf["_layer"]],
                    "scale": leaf["scale"][leaf["_layer"]],
                    **({"orig_shape": leaf["orig_shape"]}
                       if "orig_shape" in leaf else {})}
        return _dequantize_int4(leaf, dtype)
    q, scale = leaf[QKEY], leaf["scale"]
    if "_layer" in leaf:
        q, scale = q[leaf["_layer"]], scale[leaf["_layer"]]
    w = (q.astype(jnp.float32) * scale).astype(dtype)
    if "orig_shape" in leaf:        # slice kernel-tile padding back off
        w = w[..., : leaf["orig_shape"].n, : leaf["orig_shape"].k]
    return w


def _should_quantize(name: str, leaf, min_size: int) -> bool:
    """Dense kernels only: norms are stacked (n_layers, D) 2D leaves that
    must NOT be quantized (their per-layer semantics break 2D per-channel
    scales), and embeddings feed gathers."""
    return (hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.size >= min_size
            and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
            and "norm" not in name and "embed" not in name)


def quantize_llama_params(params: dict, min_size: int = 1 << 16) -> dict:
    """Quantize the big dense kernels of a llama param tree; norms, biases
    and embeddings stay bf16 (embeddings feed gathers)."""

    def walk(path, leaf):
        name = path[-1] if path else ""
        if _should_quantize(name, leaf, min_size):
            return quantize_array(leaf)
        return leaf

    def rec(tree, path=()):
        if isinstance(tree, dict):
            return {k: rec(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(rec(v, path) for v in tree)
        return walk(path, tree)

    return rec(params)


def quantize_llama_params_inplace(params: dict, min_size: int = 1 << 16,
                                  fuse: bool = True) -> dict:
    """Like :func:`quantize_llama_params` but replaces leaves one at a time
    so the bf16 original is freed as quantization proceeds — peak HBM is the
    full bf16 tree plus ONE int8 leaf, not both trees (needed to quantize a
    7B resident on a 16GB chip).

    ``fuse=True`` (inference layout) merges qkv and gate/up into single
    leaves and pads to 2MB-block tiles for the fused int8 decode kernel
    (ops/int4_matmul.py int8_matmul*); use False for LoRA wrapping."""

    def rec(tree, path=()):
        if isinstance(tree, dict):
            for k in list(tree):
                child = tree[k]
                if isinstance(child, (dict, list, tuple)):
                    rec(child, path + (k,))
                else:
                    if _should_quantize(k, child, min_size):
                        tree[k] = quantize_array(child)
                        del child  # drop the bf16 leaf before the next one
        elif isinstance(tree, (list, tuple)):
            for v in tree:
                rec(v, path)

    rec(params)
    layers = params.get("layers")
    if fuse and isinstance(layers, dict) and "self_attn" in layers \
            and all(is_quantized(layers["self_attn"].get(n))
                    for n in ("q_proj", "k_proj", "v_proj")) \
            and all(is_quantized(layers["mlp"].get(n))
                    for n in ("gate_proj", "up_proj")):
        params["layers"] = _fuse_layer_projections(layers, QKEY)

    def pad_rec(tree):
        for k in list(tree):
            child = tree[k]
            if isinstance(child, dict):
                if QKEY in child:
                    tree[k] = pad_int8_leaf(child)
                else:
                    pad_rec(child)

    if fuse:
        pad_rec(params)
    return params


# ---------------------------------------------------------------------------
# int4 (packed pairs) — the load_4bit analog
# ---------------------------------------------------------------------------

Q4KEY = "qint4"


def _quantize_2d_int4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Symmetric int4 per output channel, two values packed per int8 along
    the input (last) dim, which must be even.

    Split-half packing: byte column i holds input columns (i, i + n/2) in
    its (low, high) nibbles, so dequantization is one concatenate — an
    interleaved (2i, 2i+1) layout would need a stack+reshape shuffle that
    dominates decode time on the VPU.

    Mixed-convention nibbles ("e8m"): the LOW nibble is stored excess-8
    (value + 8, in [1, 15]) and the HIGH nibble is stored two's-complement
    in place.  The fused kernel (ops/int4_matmul.py) then extracts both
    operands with just TWO int32 AND ops over four bytes at a time —
    ``word & 0x0F0F0F0F`` is the excess-8 low half (constant -8 bias
    folded into a per-row correction) and ``word & 0xF0F0F0F0`` bitcast
    to int8 is *exactly* ``16 * w_hi`` (the two's-complement nibble sits
    in the byte's top bits, so the int8 reading scales it by 16 with the
    sign intact); the 1/16 folds into one scalar multiply on the hi-dot
    result.  The earlier both-excess-8 layout needed a third VPU op
    (``(word >> 4) & mask``) per word; the hardware A/B gain was small
    (~+1.5 tok/s b1 end-to-end — the kernels were already DMA/overhead
    bound, see ops/int4_matmul.py) but never negative, so the cheaper
    form is the format."""
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1, keepdims=True) / 7.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -7, 7).astype(jnp.int8)
    half = q.shape[-1] // 2
    lo = (q[..., :half] + 8).astype(jnp.uint8)
    hi = q[..., half:].astype(jnp.uint8)        # two's-complement nibble
    packed = ((hi & 0xF) << 4) | (lo & 0xF)
    return {Q4KEY: packed.astype(jnp.int8), "scale": scale.astype(jnp.float32)}


@jax.jit
def _quantize_stacked_int4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    n = w.shape[0]

    def body(i, carry):
        q, scale = carry
        part = _quantize_2d_int4(w[i])
        return (q.at[i].set(part[Q4KEY]), scale.at[i].set(part["scale"]))

    q0 = jnp.zeros(w.shape[:-1] + (w.shape[-1] // 2,), jnp.int8)
    s0 = jnp.zeros(w.shape[:-1] + (1,), jnp.float32)
    q, scale = jax.lax.fori_loop(0, n, body, (q0, s0))
    return {Q4KEY: q, "scale": scale}


def quantize_array_int4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    w = jnp.asarray(w)
    assert w.shape[-1] % 2 == 0, w.shape
    if w.ndim <= 2:
        return _quantize_2d_int4(w)
    return dict(_quantize_stacked_int4(w))


def _unpack_int4(packed: jnp.ndarray):
    """(.., out, in/2) packed bytes -> signed (lo, hi) int8 halves
    (e8m storage: low nibble excess-8, high nibble two's-complement)."""
    u = packed.astype(jnp.uint8)
    lo = (u & 0xF).astype(jnp.int8) - 8
    hi_n = ((u >> 4) & 0xF).astype(jnp.int8)
    hi = jnp.where(hi_n >= 8, hi_n - 16, hi_n)
    return lo, hi


# Byte whose two e8m nibbles both decode to weight 0 (low nibble
# excess-8 zero = 8, high nibble two's-complement zero = 0) — used to pad
# packed leaves up to kernel-friendly tile multiples with EXACT math (a
# zero weight contributes nothing regardless of the activation value).
PAD_BYTE = 0x08

import dataclasses as _dataclasses


@jax.tree_util.register_static
@_dataclasses.dataclass(frozen=True)
class LogicalShape:
    """Static (N, K) of a padded int4 leaf: registered as a static pytree
    node so it survives jit boundaries as a compile-time constant instead
    of becoming a traced leaf (slice bounds must be static)."""

    n: int
    k: int


def pad_int4_leaf(leaf: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Pad a packed leaf so the fused kernel can use ~2MB weight blocks:
    byte columns to a multiple of 512 and output rows to a multiple of
    2048 (only for leaves already at that scale — tiny test leaves stay
    exact).  Measured on v5e: (2048, 1024) blocks stream at ~650 GB/s vs
    ~385 at the 256KB blocks the unpadded shapes force.  ``orig_shape``
    records the logical (N, K) so dequantize/matmul can slice the pad
    back off."""
    q, s = leaf[Q4KEY], leaf["scale"]
    N, Kh = q.shape[-2], q.shape[-1]
    Khp = -(-Kh // 512) * 512 if Kh >= 512 else Kh
    Np = -(-N // 2048) * 2048 if N >= 2048 else N
    if (Khp, Np) == (Kh, N):
        return leaf
    pad2 = [(0, 0)] * (q.ndim - 2) + [(0, Np - N), (0, Khp - Kh)]
    q = jnp.pad(q, pad2, constant_values=PAD_BYTE)
    s = jnp.pad(s, [(0, 0)] * (s.ndim - 2) + [(0, Np - N), (0, 0)],
                constant_values=1.0)
    return {Q4KEY: q, "scale": s,
            "orig_shape": LogicalShape(int(N), int(2 * Kh))}


def pad_int8_leaf(leaf: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """int8 analog of :func:`pad_int4_leaf`: zero weights pad exactly."""
    q, s = leaf[QKEY], leaf["scale"]
    N, K = q.shape[-2], q.shape[-1]
    Kp = -(-K // 512) * 512 if K >= 512 else K
    Np = -(-N // 2048) * 2048 if N >= 2048 else N
    if (Kp, Np) == (K, N):
        return leaf
    pad2 = [(0, 0)] * (q.ndim - 2) + [(0, Np - N), (0, Kp - K)]
    q = jnp.pad(q, pad2)
    s = jnp.pad(s, [(0, 0)] * (s.ndim - 2) + [(0, Np - N), (0, 0)],
                constant_values=1.0)
    return {QKEY: q, "scale": s, "orig_shape": LogicalShape(int(N), int(K))}


def _dequantize_int4(leaf, dtype=jnp.bfloat16) -> jnp.ndarray:
    lo, hi = _unpack_int4(leaf[Q4KEY])
    if "orig_shape" in leaf:        # slice kernel-tile padding back off
        n0, k0 = leaf["orig_shape"].n, leaf["orig_shape"].k
        kh0 = k0 // 2
        lo = lo[..., :n0, :kh0]
        hi = hi[..., :n0, :kh0]
        scale = leaf["scale"][..., :n0, :]
    else:
        scale = leaf["scale"]
    q = jnp.concatenate([lo, hi], axis=-1)              # split-half layout
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _concat_quant(leaves, key: str) -> Dict[str, jnp.ndarray]:
    """Concatenate quantized leaves along the output-channel axis.  Exact:
    per-output-channel scales make quantize-then-concat identical to
    concat-then-quantize."""
    return {key: jnp.concatenate([l[key] for l in leaves], axis=-2),
            "scale": jnp.concatenate([l["scale"] for l in leaves], axis=-2)}


def _fuse_layer_projections(layers: dict, key: str = Q4KEY) -> dict:
    """Merge q/k/v -> qkv_proj and gate/up -> gateup_proj on already-
    quantized leaves.  Fewer, larger fused matmuls per decode step: each
    Pallas call costs ~20us of launch/pipeline-warmup on top of its byte
    streaming, so 7 calls/layer -> 4 is a direct latency win."""
    out = dict(layers)
    a = dict(layers["self_attn"])
    a["qkv_proj"] = _concat_quant([a.pop("q_proj"), a.pop("k_proj"),
                                   a.pop("v_proj")], key)
    out["self_attn"] = a
    m = dict(layers["mlp"])
    m["gateup_proj"] = _concat_quant([m.pop("gate_proj"), m.pop("up_proj")],
                                     key)
    out["mlp"] = m
    return out


def quantize_llama_params_int4(params: dict, min_size: int = 1 << 16,
                               inplace: bool = False,
                               fuse: bool = True) -> dict:
    """int4-pack the dense kernels (reference: builder.py load_4bit).

    ``fuse=True`` (inference layout) additionally merges the attention
    qkv and MLP gate/up weights into single leaves so the fused decode
    kernel runs once per group, and pads every packed leaf to
    2MB-block-divisible tiles (pad_int4_leaf).  Set False to keep the
    exact HF-keyed layout — required for LoRA wrapping (adapter shapes
    derive from leaf shapes, so padded/fused leaves would mis-size the
    low-rank factors) and for the delta tools."""

    def rec(tree):
        for k in list(tree):
            child = tree[k]
            if isinstance(child, dict) and QKEY not in child and Q4KEY not in child:
                rec(child)
            elif _should_quantize(k, child, min_size) and \
                    getattr(child, "shape", (0, 0))[-1] % 2 == 0:
                tree[k] = quantize_array_int4(child)
                del child

    if not inplace:
                params = jax.tree.map(lambda x: x, params)
    rec(params)
    layers = params.get("layers")
    if fuse and isinstance(layers, dict) and "self_attn" in layers \
            and all(is_quantized(layers["self_attn"].get(n))
                    for n in ("q_proj", "k_proj", "v_proj")) \
            and all(is_quantized(layers["mlp"].get(n))
                    for n in ("gate_proj", "up_proj")):
        params["layers"] = _fuse_layer_projections(layers)

    def pad_rec(tree):
        for k in list(tree):
            child = tree[k]
            if isinstance(child, dict):
                if Q4KEY in child:
                    tree[k] = pad_int4_leaf(child)
                else:
                    pad_rec(child)

    if fuse:
        pad_rec(params)
    return params


import contextlib

# Trace-time gate for the fused quantized matmuls.  pallas_call has no
# reverse-mode AD rule, so any trace that will be differentiated (QLoRA /
# adapter training over a quantized base) must take the dequantize+dot
# fallback instead.  make_train_step disables the fused path for the whole
# step trace; inference paths leave it on.
_FUSED_PROJ_ENABLED = [True]


@contextlib.contextmanager
def disable_fused_proj():
    """Disable fused Pallas dequant-matmuls for code traced inside this
    block (use around differentiated traces — the fused kernels are
    forward-only)."""
    _FUSED_PROJ_ENABLED.append(False)
    try:
        yield
    finally:
        _FUSED_PROJ_ENABLED.pop()


def fused_int4_proj(x: jnp.ndarray, leaf) -> jnp.ndarray | None:
    """Fused dequant-matmul for a quantized (int4 or int8, optionally
    LoRA-wrapped) leaf: ``x (..., K) -> (..., N)`` without materializing
    bf16 weights.

    Returns None when the leaf/shape/backend is ineligible — the caller
    falls back to ``dequantize_array`` + dot (models/llama.py ``proj``).
    Only used on the TPU backend for decode-sized row counts; CPU tests
    exercise the kernels via ``interpret=True`` directly.
    """
    from .int4_matmul import (int4_matmul, int4_matmul_eligible,
                              int4_matmul_stacked, int8_matmul,
                              int8_matmul_stacked)

    if not _FUSED_PROJ_ENABLED[-1]:
        return None
    if not isinstance(leaf, dict) or x.dtype != jnp.bfloat16:
        return None
    lora = None
    if "lora_a" in leaf:
        lora, leaf = leaf, leaf["w"]
        if not isinstance(leaf, dict):
            return None
        if "orig_shape" in leaf:
            # LoRA deltas are sized from the logical leaf shape; the fused
            # branch below computes the delta from the padded-geometry x2,
            # which would shape-error against kernel-tile padding.  The
            # fuse=False layout convention avoids this, but enforce it.
            return None
    is4 = Q4KEY in leaf
    if not is4 and QKEY not in leaf:
        return None
    if jax.default_backend() != "tpu":
        return None
    key = Q4KEY if is4 else QKEY
    stacked = "_layer" in leaf
    pshape = leaf[key].shape[1:] if stacked else leaf[key].shape
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if not int4_matmul_eligible(rows, pshape):
        return None
    x2 = x.reshape(rows, x.shape[-1])
    kp = pshape[-1]
    if is4 and x2.shape[-1] != 2 * kp:
        # padded leaf (pad_int4_leaf): re-lay the activation into the
        # padded split-half geometry — [lo_half, 0-pad, hi_half, 0-pad]
        # (the pad weights decode to exactly 0, so zeros here are exact)
        kh0 = x2.shape[-1] // 2
        z = jnp.zeros((rows, kp - kh0), x2.dtype)
        x2 = jnp.concatenate([x2[:, :kh0], z, x2[:, kh0:], z], axis=-1)
    elif not is4 and x2.shape[-1] != kp:
        # padded int8 leaf: zero weights pad the tail columns exactly
        x2 = jnp.pad(x2, ((0, 0), (0, kp - x2.shape[-1])))
    if stacked:
        fn = int4_matmul_stacked if is4 else int8_matmul_stacked
        y = fn(x2, leaf[key], leaf["scale"], leaf["_layer"])
    else:
        fn = int4_matmul if is4 else int8_matmul
        y = fn(x2, leaf[key], leaf["scale"])
    if "orig_shape" in leaf:
        y = y[:, : leaf["orig_shape"].n]
    if lora is not None:
        # low-rank delta on the side: (x @ A^T) @ B^T * scale — tiny GEMMs,
        # no base-weight materialization (ops/lora.py shapes: A (r, in),
        # B (out, r))
        a = x2 @ lora["lora_a"].astype(x2.dtype).T
        y = y + (a @ lora["lora_b"].astype(x2.dtype).T) * lora["lora_scale"]
    return y.reshape(x.shape[:-1] + (y.shape[-1],))


def fused_quant_mlp(x: jnp.ndarray, mlp: dict) -> jnp.ndarray | None:
    """Whole-MLP fused kernel for a stacked quantized mlp subtree:
    ``silu(x @ gate.T) * (x @ up.T) @ down.T`` in ONE pallas invocation
    (ops/fused_mlp.py) — saves a per-layer kernel launch + the XLA
    elementwise between the two matmuls during decode.

    Returns None when ineligible (caller falls back to the per-projection
    ``proj`` path): needs the fused+padded inference layout
    (``gateup_proj`` leaf), stacked ``_layer`` views, no LoRA, bf16
    activations, decode-narrow rows, TPU backend."""
    if not _FUSED_PROJ_ENABLED[-1]:
        return None
    gu, dn = mlp.get("gateup_proj"), mlp.get("down_proj")
    if not (isinstance(gu, dict) and isinstance(dn, dict)):
        return None
    if "_layer" not in gu or "_layer" not in dn or "lora_a" in dn:
        return None
    if x.dtype != jnp.bfloat16:
        return None
    is4 = Q4KEY in gu
    key = Q4KEY if is4 else QKEY
    if key not in gu or key not in dn or (Q4KEY in gu) != (Q4KEY in dn):
        return None
    if jax.default_backend() != "tpu":
        return None
    from .fused_mlp import quant_mlp_eligible, quant_mlp_stacked

    D = x.shape[-1]
    if "orig_shape" in dn:
        i_orig, n_dn_orig = dn["orig_shape"].k, dn["orig_shape"].n
    else:
        i_orig = dn[key].shape[-1] * (2 if is4 else 1)
        n_dn_orig = dn[key].shape[-2]
    gu_n_orig = gu["orig_shape"].n if "orig_shape" in gu \
        else gu[key].shape[-2]
    if gu_n_orig != 2 * i_orig:
        return None
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if not quant_mlp_eligible(rows, gu[key].shape, dn[key].shape,
                              bits=4 if is4 else 8, d_model=D,
                              i_orig=i_orig):
        return None
    y = quant_mlp_stacked(
        x.reshape(rows, D), gu[key], gu["scale"], dn[key], dn["scale"],
        gu["_layer"], bits=4 if is4 else 8, i_orig=i_orig)
    return y[:, :n_dn_orig].reshape(x.shape[:-1] + (n_dn_orig,))


def tree_nbytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))

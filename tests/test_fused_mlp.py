"""Fused single-kernel quantized MLP (ops/fused_mlp.py) vs the unfused
dequantize-and-matmul reference, in Pallas interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.ops.fused_mlp import (quant_mlp_eligible,
                                             quant_mlp_stacked)
from matryoshka_mm_tpu.ops.quant import (Q4KEY, QKEY, _concat_quant,
                                         dequantize_array, pad_int4_leaf,
                                         pad_int8_leaf, quantize_array,
                                         quantize_array_int4)

pytestmark = pytest.mark.quick


def _make_leaves(rng, D, I, L, bits):
    """Stacked fused gate/up + down leaves the inference layout produces
    (quantize -> concat gate/up -> pad), plus f32 references."""
    quant = quantize_array_int4 if bits == 4 else quantize_array
    pad = pad_int4_leaf if bits == 4 else pad_int8_leaf
    key = Q4KEY if bits == 4 else QKEY
    gus, dns, refs = [], [], []
    for _ in range(L):
        wg = jnp.asarray(rng.standard_normal((I, D)), jnp.float32) * 0.05
        wu = jnp.asarray(rng.standard_normal((I, D)), jnp.float32) * 0.05
        wd = jnp.asarray(rng.standard_normal((D, I)), jnp.float32) * 0.05
        gu = pad(_concat_quant([quant(wg), quant(wu)], key))
        dn = pad(quant(wd))
        gus.append(gu)
        dns.append(dn)
        refs.append((dequantize_array(gu, jnp.float32),
                     dequantize_array(dn, jnp.float32)))
    stack = lambda ls: {k: jnp.stack([l[k] for l in ls])
                        for k in (key, "scale")}
    meta = {k: v for k, v in gus[0].items() if k == "orig_shape"}
    meta_dn = {k: v for k, v in dns[0].items() if k == "orig_shape"}
    return ({**stack(gus), **meta}, {**stack(dns), **meta_dn}, refs)


def _reference_mlp(x, gu_w, dn_w, I):
    g = x.astype(jnp.float32) @ gu_w[:I].T
    u = x.astype(jnp.float32) @ gu_w[I:2 * I].T
    h = (jax.nn.silu(g) * u).astype(jnp.bfloat16).astype(jnp.float32)
    return h @ dn_w[:, :I].T


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("D,I,rows", [
    (256, 1024, 1),    # unpadded geometry
    (256, 1536, 4),    # down K padded (768 -> 1024 packed cols for int4)
    (256, 1280, 20),   # rows > 16 (bm 32), padded
])
def test_fused_mlp_matches_unfused(bits, D, I, rows):
    rng = np.random.default_rng(bits * 100 + D + I)
    L = 3
    gu, dn, refs = _make_leaves(rng, D, I, L, bits)
    key = Q4KEY if bits == 4 else QKEY
    assert quant_mlp_eligible(rows, gu[key].shape, dn[key].shape,
                              bits=bits, d_model=D, i_orig=I)
    x = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
    for l in range(L):
        ref = _reference_mlp(x, *refs[l], I)[:, :D]
        got = quant_mlp_stacked(x, gu[key], gu["scale"], dn[key],
                                dn["scale"], jnp.int32(l), bits=bits,
                                i_orig=I, interpret=True)[:, :D]
        rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert rel < 0.02, (bits, l, rel)


def test_fused_mlp_eligibility_gates():
    # prefill-sized rows fall back
    assert not quant_mlp_eligible(64, (2, 2048, 128), (2, 256, 512),
                                  bits=4, d_model=256, i_orig=1024)
    # gate/up K must be one full block (no K-padding on gate/up)
    assert not quant_mlp_eligible(1, (2, 2048, 256), (2, 256, 512),
                                  bits=4, d_model=256, i_orig=1024)
    # misaligned intermediate width
    assert not quant_mlp_eligible(1, (2, 1408, 128), (2, 256, 512),
                                  bits=4, d_model=256, i_orig=704)


def _make_o_leaf(rng, D, L, bits):
    quant = quantize_array_int4 if bits == 4 else quantize_array
    pad = pad_int4_leaf if bits == 4 else pad_int8_leaf
    key = Q4KEY if bits == 4 else QKEY
    os_, refs = [], []
    for _ in range(L):
        wo = jnp.asarray(rng.standard_normal((D, D)), jnp.float32) * 0.05
        o = pad(quant(wo))
        os_.append(o)
        refs.append(dequantize_array(o, jnp.float32))
    stack = lambda ls: {k: jnp.stack([l[k] for l in ls])
                        for k in (key, "scale")}
    meta = {k: v for k, v in os_[0].items() if k == "orig_shape"}
    return {**stack(os_), **meta}, refs


def _reference_tail(hidden, attn_out, o_w, gu_w, dn_w, I, w2, eps):
    """The unfused path's math at its exact rounding points:
    bf16 o output + bf16 residual, f32 RMSNorm -> bf16, bf16 MLP kernel
    boundaries, bf16 final residual (models/llama.py _layer_forward)."""
    o = (attn_out.astype(jnp.float32) @ o_w.T).astype(jnp.bfloat16)
    x2 = hidden + o
    xf = x2.astype(jnp.float32)
    h2 = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    h2 = (h2 * w2.astype(jnp.float32)).astype(jnp.bfloat16)
    mlp = _reference_mlp(h2, gu_w, dn_w, I).astype(jnp.bfloat16)
    return x2 + mlp


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("D,I,rows", [
    (256, 1024, 1),    # unpadded geometry
    (256, 1536, 4),    # down K padded
])
def test_fused_layer_tail_matches_unfused(bits, D, I, rows):
    from matryoshka_mm_tpu.ops.fused_mlp import (quant_layer_tail_stacked,
                                                 quant_tail_eligible)

    rng = np.random.default_rng(bits * 77 + D + I)
    L = 2
    gu, dn, refs = _make_leaves(rng, D, I, L, bits)
    o, o_refs = _make_o_leaf(rng, D, L, bits)
    key = Q4KEY if bits == 4 else QKEY
    assert quant_tail_eligible(rows, o[key].shape, gu[key].shape,
                               dn[key].shape, bits=bits, d_model=D,
                               i_orig=I)
    hidden = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
    attn_out = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((D,)), jnp.float32) * 0.1 + 1.0
    eps = 1e-5
    for l in range(L):
        ref = _reference_tail(hidden, attn_out, o_refs[l][:D, :D],
                              *refs[l], I, w2, eps)
        got = quant_layer_tail_stacked(
            hidden, attn_out, o[key], o["scale"], gu[key], gu["scale"],
            dn[key], dn["scale"], w2, jnp.int32(l), bits=bits, d_model=D,
            i_orig=I, eps=eps, interpret=True)[:, :D]
        rel = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9))
        assert rel < 0.02, (bits, l, rel)


def test_fused_layer_tail_wrapper_fallbacks():
    """models/llama.py relies on fused_quant_layer_tail returning None for
    non-inference layouts (LoRA, unfused, f32, CPU, kill switch)."""
    from matryoshka_mm_tpu.ops.quant import fused_quant_layer_tail

    rng = np.random.default_rng(1)
    D, I = 256, 1024
    gu, dn, _ = _make_leaves(rng, D, I, 2, 4)
    o, _ = _make_o_leaf(rng, D, 2, 4)
    li = jnp.int32(0)
    mlp = {"gateup_proj": {**gu, "_layer": li},
           "down_proj": {**dn, "_layer": li}}
    o_leaf = {**o, "_layer": li}
    h = jnp.ones((1, D), jnp.bfloat16)
    w2 = jnp.ones((D,), jnp.float32)
    # CPU backend -> None (kernel is TPU-only outside interpret tests)
    assert fused_quant_layer_tail(h, h, o_leaf, w2, mlp, 1e-5) is None
    # f32 activations -> None
    assert fused_quant_layer_tail(h.astype(jnp.float32), h, o_leaf, w2,
                                  mlp, 1e-5) is None
    # LoRA-wrapped o leaf -> None
    assert fused_quant_layer_tail(
        h, h, {"lora_a": 1, **o_leaf}, w2, mlp, 1e-5) is None
    # unstacked o leaf -> None
    assert fused_quant_layer_tail(h, h, dict(o), w2, mlp, 1e-5) is None


@pytest.mark.parametrize("bits", [4, 8])
def test_fused_norm_qkv_matches_unfused(bits):
    from matryoshka_mm_tpu.ops.fused_mlp import (quant_norm_qkv_eligible,
                                                 quant_norm_qkv_stacked)

    rng = np.random.default_rng(bits)
    D, N, L, rows = 256, 768, 2, 4
    quant = quantize_array_int4 if bits == 4 else quantize_array
    key = Q4KEY if bits == 4 else QKEY
    leaves, refs = [], []
    for _ in range(L):
        w = jnp.asarray(rng.standard_normal((N, D)), jnp.float32) * 0.05
        q = quant(w)
        leaves.append(q)
        refs.append(dequantize_array(q, jnp.float32))
    stacked = {k: jnp.stack([l[k] for l in leaves]) for k in (key, "scale")}
    assert quant_norm_qkv_eligible(rows, stacked[key].shape, bits=bits,
                                   d_model=D)
    hidden = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((D,)), jnp.float32) * 0.1 + 1.0
    eps = 1e-5
    for l in range(L):
        xf = hidden.astype(jnp.float32)
        h2 = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
        h2 = (h2 * w1).astype(jnp.bfloat16)
        ref = h2.astype(jnp.float32) @ refs[l].T
        got = quant_norm_qkv_stacked(hidden, w1, stacked[key],
                                     stacked["scale"], jnp.int32(l),
                                     bits=bits, d_model=D, eps=eps,
                                     interpret=True)
        rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert rel < 0.02, (bits, l, rel)


def test_fused_quant_mlp_wrapper_fallbacks():
    """models/llama.py relies on fused_quant_mlp returning None for every
    non-inference layout (unfused leaves, LoRA, f32 activations, CPU)."""
    from matryoshka_mm_tpu.ops.quant import fused_quant_mlp

    rng = np.random.default_rng(0)
    gu, dn, _ = _make_leaves(rng, 256, 1024, 2, 4)
    mlp = {"gateup_proj": {**gu, "_layer": jnp.int32(0)},
           "down_proj": {**dn, "_layer": jnp.int32(0)}}
    x = jnp.ones((1, 256), jnp.bfloat16)
    # CPU backend -> None (kernel is TPU-only outside interpret tests)
    assert fused_quant_mlp(x, mlp) is None
    # f32 activations -> None regardless of backend
    assert fused_quant_mlp(x.astype(jnp.float32), mlp) is None
    # unfused layout (no gateup_proj leaf) -> None
    assert fused_quant_mlp(x, {"gate_proj": gu, "up_proj": gu,
                               "down_proj": dn}) is None

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

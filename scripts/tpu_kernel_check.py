"""On-device validation of the round-3 kernel paths (run on a real TPU).

The pytest suite runs on the CPU backend (interpret-mode Pallas), so
Mosaic compilation of the new paths is only proven on hardware.  This
drives, at 7B-like shapes:

1. int8 paged-attention kernel (plain + stacked) vs the dequantized
   gather reference;
2. the (B, S) speculative verify step through the paged decode core
   (gather path) vs S sequential single-token steps' final logits;
3. int8 KV flash-decode (dense stacked) vs reference.

Exits non-zero on any mismatch.  ~2 min warm.
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _quant(x):
    s = np.maximum(np.abs(x).max(axis=-1) / 127.0, 1e-8)
    q = np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def check_paged_int8():
    from matryoshka_mm_tpu.ops.attention import attention_reference
    from matryoshka_mm_tpu.ops.paged_attention import (
        paged_decode_attention, paged_decode_attention_stacked)

    rng = np.random.default_rng(0)
    B, H, Hkv, Dh = 4, 32, 32, 128
    PAGE, NPAGES, P = 64, 48, 8
    q = rng.standard_normal((B, H, Dh)).astype(np.float32) * 0.3
    k_pages = rng.standard_normal((NPAGES, PAGE, Hkv, Dh)).astype(np.float32)
    v_pages = rng.standard_normal((NPAGES, PAGE, Hkv, Dh)).astype(np.float32)
    tables = rng.permutation(NPAGES)[: B * P].reshape(B, P).astype(np.int32)
    row_len = np.asarray([37, 200, 511, 64], np.int32)
    kq, ks = _quant(k_pages)
    vq, vs = _quant(v_pages)

    got = np.asarray(paged_decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(kq), jnp.asarray(vq),
        jnp.asarray(tables), jnp.asarray(row_len),
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs)), np.float32)

    kd = kq.astype(np.float32) * ks[..., None]
    vd = vq.astype(np.float32) * vs[..., None]
    outs = []
    for b in range(B):
        k_rows = kd[tables[b]].reshape(P * PAGE, Hkv, Dh)
        v_rows = vd[tables[b]].reshape(P * PAGE, Hkv, Dh)
        n = row_len[b] + 1
        out = attention_reference(
            jnp.asarray(q[b:b + 1, :, None, :]),
            jnp.asarray(k_rows[None].transpose(0, 2, 1, 3)),
            jnp.asarray(v_rows[None].transpose(0, 2, 1, 3)),
            causal=False,
            kv_valid=jnp.asarray((np.arange(P * PAGE) < n)[None]))
        outs.append(np.asarray(out[0, :, 0], np.float32))
    want = np.stack(outs)
    err = np.abs(got - want).max()
    print(f"paged int8 kernel: max_err={err:.4f}")
    assert err < 0.02, err

    L = 2
    k_all = np.stack([kq, _quant(v_pages)[0]])
    ks_all = np.stack([ks, _quant(v_pages)[1]])
    got1 = np.asarray(paged_decode_attention_stacked(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k_all),
        jnp.asarray(np.stack([vq, vq])), jnp.asarray(0, jnp.int32),
        jnp.asarray(tables), jnp.asarray(row_len),
        k_scale=jnp.asarray(ks_all), v_scale=jnp.asarray(np.stack([vs, vs]))),
        np.float32)
    err = np.abs(got1 - got).max()
    print(f"paged int8 stacked-vs-plain: max_err={err:.4f}")
    assert err < 2e-2, err
    del L


def check_spec_verify():
    import dataclasses

    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9, 11, 23]], np.int32)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=12, decode_chunk=2,
                               eos_token_id=-1)
    outs = {}
    for k in (0, 4):
        b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                              max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                              backend="paged", page_size=8, speculative_k=k)
        try:
            r = b.submit(ids, px, numtoks=4, max_new_tokens=12)
            outs[k] = np.concatenate(list(b.stream(r)))
        finally:
            b.shutdown()
    same = (outs[0] == outs[4]).all()
    print(f"spec verify on device: vanilla={outs[0][:6]}... match={same}")
    assert same


def check_flash_int8():
    from matryoshka_mm_tpu.models.llama import _quantize_kv_slots
    from matryoshka_mm_tpu.ops.decode_attention import flash_decode_attention

    rng = np.random.default_rng(2)
    B, H, Hkv, Dh, S = 4, 32, 32, 128, 512
    q = rng.standard_normal((B, H, Dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((B, S, Hkv, Dh)).astype(np.float32)
    v = rng.standard_normal((B, S, Hkv, Dh)).astype(np.float32)
    kq, ks = _quant(k)
    vq, vs = _quant(v)
    n_valid = 350
    kv_valid = jnp.broadcast_to(jnp.arange(S)[None] < n_valid, (B, S))
    kv_pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    q_pos = jnp.full((B,), n_valid - 1, jnp.int32)
    got = np.asarray(flash_decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(kq), jnp.asarray(vq),
        kv_valid, kv_pos, q_pos, k_scale=jnp.asarray(ks),
        v_scale=jnp.asarray(vs),
        interpret=jax.default_backend() != "tpu"), np.float32)
    # reference over dequantized values
    kd = (kq.astype(np.float32) * ks[..., None])
    vd = (vq.astype(np.float32) * vs[..., None])
    import scipy.special as sp  # noqa: F401 — numpy-only softmax below

    outs = []
    for b in range(B):
        rows = []
        for h in range(H):
            lg = (q[b, h] / np.sqrt(Dh)) @ kd[b, :, h].T
            lg = np.where((np.arange(S) < n_valid), lg, -1e30)
            p = np.exp(lg - lg.max())
            p /= p.sum()
            rows.append(p @ vd[b, :, h])
        outs.append(np.stack(rows))
    err = np.abs(got - np.stack(outs)).max()
    print(f"flash-decode int8: max_err={err:.4f}")
    assert err < 0.02, err

    del _quantize_kv_slots


if __name__ == "__main__":
    dev = jax.devices()[0]
    print("device:", dev, dev.platform)
    if dev.platform != "tpu":
        print("NOT a TPU — this script validates Mosaic compilation; "
              "run it on the chip", file=sys.stderr)
    check_paged_int8()
    check_spec_verify()
    check_flash_int8()
    print("ALL TPU KERNEL CHECKS PASSED")

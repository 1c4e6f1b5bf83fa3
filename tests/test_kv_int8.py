"""Opt-in int8 KV cache: quantized write path, dequantizing XLA read
path, and the int8 flash-decode kernel (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.models.llama import (LlamaConfig, embed_tokens,
                                            init_kv_cache, init_llama_params,
                                            llama_forward, lm_head)

pytestmark = pytest.mark.quick


def _decode_tokens(cfg, params, ids, steps=6):
    B, T = ids.shape
    cache = init_kv_cache(cfg, B, T + steps)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    h = embed_tokens(params, ids)
    h, cache = llama_forward(params, cfg, h, position_ids=pos, cache=cache)
    tok = jnp.argmax(lm_head(params, h)[:, -1], axis=-1)
    out = [tok]
    for s in range(steps - 1):
        h = embed_tokens(params, tok[:, None])
        p = jnp.full((B, 1), T + s, jnp.int32)
        h, cache = llama_forward(params, cfg, h, position_ids=p, cache=cache)
        tok = jnp.argmax(lm_head(params, h)[:, -1], axis=-1)
        out.append(tok)
    return np.stack([np.asarray(t) for t in out], 1), cache


def test_int8_kv_cache_decode_matches_f32():
    """Greedy decode with the int8 KV cache tracks the f32-cache decode
    (tiny config, XLA read path — per-slot absmax keeps logits close)."""
    cfg = LlamaConfig.tiny_debug()
    cfg8 = __import__("dataclasses").replace(cfg, kv_cache_dtype="int8")
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(5, 500, (2, 12)), jnp.int32)
    toks_f32, cache_f = _decode_tokens(cfg, params, ids)
    toks_i8, cache_q = _decode_tokens(cfg8, params, ids)
    assert cache_q.k.dtype == jnp.int8 and cache_q.k_scale is not None
    assert cache_f.k_scale is None
    # random-init logits are diffuse; demand most greedy tokens agree
    agree = (toks_f32 == toks_i8).mean()
    assert agree >= 0.75, (agree, toks_f32, toks_i8)


def test_int8_kv_quantize_roundtrip():
    from matryoshka_mm_tpu.models.llama import _quantize_kv_slots

    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 2, 5, 3, 16)), jnp.float32)
    q, s = _quantize_kv_slots(x)
    back = q.astype(jnp.float32) * s[..., None]
    err = float(jnp.max(jnp.abs(back - x)))
    assert err <= float(jnp.max(jnp.abs(x))) / 127.0 + 1e-6


def test_flash_decode_int8_interpret_matches_reference():
    """The int8 flash-decode kernel (scales folded into logits and
    probabilities) matches full-precision attention over the dequantized
    cache."""
    from matryoshka_mm_tpu.models.llama import _quantize_kv_slots
    from matryoshka_mm_tpu.ops.decode_attention import flash_decode_attention

    rng = np.random.default_rng(2)
    B, H, Hkv, Dh, S = 2, 4, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, Dh)), jnp.float32)
    kq, ks = _quantize_kv_slots(k[None])
    vq, vs = _quantize_kv_slots(v[None])
    kq, ks, vq, vs = kq[0], ks[0], vq[0], vs[0]
    n_valid = 50
    kv_valid = jnp.arange(S)[None, :] < n_valid
    kv_valid = jnp.broadcast_to(kv_valid, (B, S))
    kv_pos = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    q_pos = jnp.full((B,), n_valid - 1, jnp.int32)

    got = flash_decode_attention(
        q.astype(jnp.bfloat16), kq, vq, kv_valid, kv_pos, q_pos,
        k_scale=ks, v_scale=vs, interpret=True)

    # reference: dequantized cache, per-head softmax with GQA expansion
    kd = kq.astype(jnp.float32) * ks[..., None]
    vd = vq.astype(jnp.float32) * vs[..., None]
    group = H // Hkv
    outs = []
    for b in range(B):
        rows = []
        for h in range(H):
            kv_h = h // group
            logits = (q[b, h] / np.sqrt(Dh)) @ kd[b, :, kv_h].T
            logits = jnp.where(kv_valid[b] & (kv_pos[b] <= q_pos[b]),
                               logits, -1e30)
            p = jax.nn.softmax(logits)
            rows.append(p @ vd[b, :, kv_h])
        outs.append(jnp.stack(rows))
    ref = jnp.stack(outs)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
    assert err < 0.05, err


def test_bf16_kv_path_unchanged():
    """Without the opt-in, caches stay bf16/f32 with no scale buffers."""
    cfg = LlamaConfig.tiny_debug()
    cache = init_kv_cache(cfg, 1, 8)
    assert cache.k.dtype == jnp.float32 and cache.k_scale is None


def test_dense_batcher_int8_kv_pool():
    """The dense continuous batcher carries int8 pools + scales through
    admit -> insert -> pooled decode."""
    import dataclasses

    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = LlavaConfig.tiny_debug()
    cfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=6, decode_chunk=2,
                               eos_token_id=-1)
    b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                          max_new_tokens=8, gen_cfg=gen_cfg, chunk=2)
    try:
        assert b.pool.k.dtype == jnp.int8 and b.pool.k_scale is not None
        req = b.submit(ids, px, numtoks=4, max_new_tokens=6)
        toks = np.concatenate(list(b.stream(req)))
        assert toks.shape[0] == 6
    finally:
        b.shutdown()


def test_paged_batcher_int8_kv_pool():
    """The paged backend honors the int8 opt-in: pools + per-slot scales,
    and greedy decode matches the bf16 paged backend token-for-token on a
    tiny model (int8 KV error is far below tiny-logit margins)."""
    import dataclasses

    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = LlavaConfig.tiny_debug()
    cfg8 = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=6, decode_chunk=2,
                               eos_token_id=-1)

    outs = {}
    for name, c in (("bf16", cfg), ("int8", cfg8)):
        b = ContinuousBatcher(params, c, max_batch=2, prefill_len=64,
                              max_new_tokens=8, gen_cfg=gen_cfg, chunk=2,
                              backend="paged")
        try:
            if name == "int8":
                assert b.paged.k.dtype == jnp.int8
                assert b.paged.k_scale is not None
                # flat (L, n_pages, page*n_kv) storage — see PagedKVCache
                L, P, page, n_kv, _ = b.paged.k.shape
                assert b.paged.k_scale.shape == (L, P, page * n_kv)
            req = b.submit(ids, px, numtoks=4, max_new_tokens=6)
            outs[name] = np.concatenate(list(b.stream(req)))
        finally:
            b.shutdown()
    assert outs["int8"].shape[0] == 6
    np.testing.assert_array_equal(outs["int8"], outs["bf16"])


def test_mpt_int8_kv_matches_bf16():
    """MPT (alibi, fused qkv) int8 KV quantizes per slot like llama —
    a raw astype would truncate bf16 K/V to 0/±1 silently."""
    import dataclasses

    from matryoshka_mm_tpu.models.llama import (LlamaConfig, init_kv_cache,
                                                init_llama_params,
                                                llama_forward)

    cfg = dataclasses.replace(LlamaConfig.tiny_debug(), arch="mpt",
                              num_key_value_heads=4)
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 6, cfg.hidden_size)),
                    jnp.float32)
    pos = jnp.arange(6)[None]
    valid = jnp.ones((1, 6), bool)

    outs = {}
    for name, c in (("bf16", cfg), ("int8", cfg8)):
        cache = init_kv_cache(c, 1, 16)
        if name == "int8":
            assert cache.k.dtype == jnp.int8 and cache.k_scale is not None
        h, cache = llama_forward(params, c, x, position_ids=pos,
                                 attn_valid=valid, cache=cache)
        outs[name] = np.asarray(h, np.float32)
        if name == "int8":
            # the cache now holds real quantized values, not astype noise
            mx = int(np.abs(np.asarray(cache.k[:, :, :6])).max())
            assert mx > 8, f"int8 codes look like raw astype: max={mx}"
    err = np.abs(outs["int8"] - outs["bf16"]).max()
    assert err < 0.05, err


def test_combine_logits_decode_int8_kv():
    """ver=v2 combine-logits stacks the per-scale prefill caches into one
    batch — the rebuilt KVCache must carry k_scale/v_scale along
    (regression: they were dropped, and the int8-KV decode trace died on
    cache_ks=None)."""
    import dataclasses

    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig, generate
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params

    cfg = LlavaConfig.tiny_debug()
    cfg8 = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=6, decode_chunk=2,
                               eos_token_id=-1)
    scale = "ver=v2_numtoks=[1,4]_pickby=entropy"
    out8 = generate(params, cfg8, ids, px,
                    matryoshka_vis_token_scale=scale, gen_cfg=gen_cfg)
    assert out8.shape == (1, 6)
    # int8-KV quantization error is far below tiny-model logit margins:
    # the combined greedy stream matches the bf16-cache one exactly
    out16 = generate(params, cfg, ids, px,
                     matryoshka_vis_token_scale=scale, gen_cfg=gen_cfg)
    np.testing.assert_array_equal(np.asarray(out8), np.asarray(out16))

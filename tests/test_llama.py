import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    apply_rope,
    embed_tokens,
    init_kv_cache,
    init_llama_params,
    llama_forward,
    llama_logits,
    lm_head,
    rms_norm,
    rope_cos_sin,
)

CFG = LlamaConfig.tiny_debug()


@pytest.fixture(scope="module")
def params():
    return init_llama_params(jax.random.PRNGKey(0), CFG)


def test_shapes(params):
    ids = jnp.arange(12).reshape(2, 6)
    logits = llama_logits(params, CFG, ids)
    assert logits.shape == (2, 6, CFG.vocab_size)
    assert logits.dtype == jnp.float32


def test_causality(params):
    """Changing a future token must not affect past logits."""
    ids1 = jnp.array([[5, 6, 7, 8]])
    ids2 = jnp.array([[5, 6, 7, 99]])
    l1 = llama_logits(params, CFG, ids1)
    l2 = llama_logits(params, CFG, ids2)
    np.testing.assert_allclose(np.asarray(l1[0, :3]), np.asarray(l2[0, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(l1[0, 3]), np.asarray(l2[0, 3]))


def test_rms_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 3, 8)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal(8).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-5))
    xt = torch.from_numpy(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    want = (xt * torch.rsqrt(var + 1e-5) * torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rope_matches_hf():
    """Check against HF LlamaRotaryEmbedding semantics (rotate-half)."""
    torch = pytest.importorskip("torch")
    B, H, S, Dh = 1, 2, 5, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    pos = np.arange(S)[None, :]
    cos, sin = rope_cos_sin(jnp.asarray(pos), Dh, 10000.0)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))

    inv_freq = 1.0 / (10000.0 ** (np.arange(0, Dh, 2) / Dh))
    ang = pos[0][:, None] * inv_freq[None, :]        # (S, Dh/2)
    emb = np.concatenate([ang, ang], axis=-1)        # (S, Dh)
    c, s = np.cos(emb), np.sin(emb)

    def rotate_half(t):
        return np.concatenate([-t[..., Dh // 2:], t[..., : Dh // 2]], -1)

    want = x * c[None, None] + rotate_half(x) * s[None, None]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_prefill_decode_matches_full_forward(params):
    """Greedy invariant: prefill+decode logits == full forward logits."""
    ids = jnp.array([[3, 14, 15, 92, 65, 35]])
    B, S = ids.shape
    full = llama_logits(params, CFG, ids)

    # prefill first 4 tokens, then decode tokens 4 and 5 through the cache
    cap = 8
    cache = init_kv_cache(CFG, B, cap, dtype=jnp.float32)
    pos = jnp.arange(4)[None, :]
    h = embed_tokens(params, ids[:, :4])
    hid, cache = llama_forward(params, CFG, h, position_ids=pos,
                               attn_valid=jnp.ones((B, 4), bool), cache=cache)
    np.testing.assert_allclose(
        np.asarray(lm_head(params, hid)[0, -1]), np.asarray(full[0, 3]), atol=2e-4
    )

    for t in range(4, 6):
        h = embed_tokens(params, ids[:, t:t + 1])
        hid, cache = llama_forward(
            params, CFG, h, position_ids=jnp.full((B, 1), t),
            attn_valid=jnp.ones((B, 1), bool), cache=cache)
        step_logits = lm_head(params, hid)[0, -1]
        np.testing.assert_allclose(np.asarray(step_logits), np.asarray(full[0, t]),
                                   atol=2e-4)


def test_left_padded_prefill(params):
    """Left padding + absolute positions must equal the unpadded forward."""
    ids = jnp.array([[7, 8, 9]])
    full = llama_logits(params, CFG, ids)

    padded = jnp.array([[0, 0, 7, 8, 9]])
    mask = jnp.array([[False, False, True, True, True]])
    pos = jnp.array([[0, 0, 0, 1, 2]])
    h = embed_tokens(params, padded)
    hid, _ = llama_forward(params, CFG, h, position_ids=pos, attn_valid=mask)
    got = lm_head(params, hid)[0, 2:]
    np.testing.assert_allclose(np.asarray(got), np.asarray(full[0]), atol=2e-4)


def test_gqa_shapes():
    cfg = LlamaConfig.tiny_debug(num_key_value_heads=2)
    p = init_llama_params(jax.random.PRNGKey(1), cfg)
    logits = llama_logits(p, cfg, jnp.arange(6).reshape(1, 6))
    assert logits.shape == (1, 6, cfg.vocab_size)

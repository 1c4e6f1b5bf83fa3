"""Mistral (GQA + sliding window) and MPT (alibi) parity vs HF torch."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from matryoshka_mm_tpu.models.convert import convert_llama, convert_mpt  # noqa: E402
from matryoshka_mm_tpu.models.llama import (  # noqa: E402
    LlamaConfig,
    alibi_slopes,
    init_llama_params,
    llama_logits,
)


def test_mistral_logits_match():
    hf_cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=8, rope_theta=10000.0,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.MistralForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="mistral", vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=8, rope_theta=10000.0,
        rms_norm_eps=1e-6, dtype="float32")  # Mistral default eps
    params = convert_llama(hf.state_dict(), cfg)

    ids = np.array([[3, 14, 15, 92, 65, 35, 89, 79, 32, 38, 46, 26]], np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama_logits(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_alibi_slopes_match_hf():
    from transformers.models.mpt.modeling_mpt import build_mpt_alibi_tensor

    for h in (4, 8, 6):
        got = np.asarray(alibi_slopes(h))
        # HF builds an (H, 1, S) tensor with bias = -slope * (S-1-j); that is
        # softmax-equivalent to our per-row -slope*(i-j) form (row-constant
        # offset).  slope = t[:, 0, 1] - t[:, 0, 0] at S=2.
        t = build_mpt_alibi_tensor(h, 2)
        want = (t[:, 0, 1] - t[:, 0, 0]).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mpt_logits_match():
    hf_cfg = transformers.MptConfig(
        vocab_size=128, d_model=32, n_heads=4, n_layers=2,
        expansion_ratio=2, max_seq_len=64,
        attn_config=transformers.models.mpt.configuration_mpt.MptAttentionConfig(
            attn_impl="torch", alibi=True, alibi_bias_max=8),
        no_bias=True,
    )
    torch.manual_seed(0)
    hf = transformers.MptForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="mpt", vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=True, dtype="float32")
    params = convert_mpt(hf.state_dict(), cfg)

    ids = np.array([[3, 14, 15, 92, 65, 35, 89, 79]], np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(llama_logits(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_mpt_generate_smoke():
    """MPT decode path through the cache (alibi positions)."""
    from matryoshka_mm_tpu.models.llama import (
        embed_tokens, init_kv_cache, llama_forward, lm_head)

    cfg = LlamaConfig(
        arch="mpt", vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32, dtype="float32")
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[5, 6, 7, 8, 9]])
    full = llama_logits(params, cfg, ids)

    cache = init_kv_cache(cfg, 1, 8, dtype=jnp.float32)
    h = embed_tokens(params, ids[:, :4])
    pos = jnp.arange(4)[None, :]
    hid, cache = llama_forward(params, cfg, h, position_ids=pos,
                               attn_valid=jnp.ones((1, 4), bool), cache=cache)
    np.testing.assert_allclose(np.asarray(lm_head(params, hid)[0, -1]),
                               np.asarray(full[0, 3]), atol=2e-4)
    h = embed_tokens(params, ids[:, 4:5])
    hid, cache = llama_forward(params, cfg, h,
                               position_ids=jnp.full((1, 1), 4),
                               attn_valid=jnp.ones((1, 1), bool), cache=cache)
    np.testing.assert_allclose(np.asarray(lm_head(params, hid)[0, -1]),
                               np.asarray(full[0, 4]), atol=2e-4)

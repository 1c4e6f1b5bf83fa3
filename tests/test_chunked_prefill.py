"""Chunked prefill == single-shot prefill, including through the flash
kernel's static q-index offset (interpret mode on CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.generate import chunked_prefill
from matryoshka_mm_tpu.models.llama import (
    LlamaConfig,
    embed_tokens,
    init_kv_cache,
    init_llama_params,
    llama_forward,
    lm_head,
)
from matryoshka_mm_tpu.models.llava import LlavaConfig


@pytest.mark.parametrize("attn_impl", ["reference", "flash"])
def test_chunked_prefill_matches_single(attn_impl):
    lcfg = LlamaConfig.tiny_debug(attn_impl=attn_impl)
    cfg = dataclasses.replace(LlavaConfig.tiny_debug(), llama=lcfg)
    params = {"llama": init_llama_params(jax.random.PRNGKey(0), lcfg)}

    B, S = 2, 256
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 100, (B, S)).astype(np.int32))
    embeds = embed_tokens(params["llama"], ids)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    valid = jnp.ones((B, S), bool)
    cap = S + 16

    # single shot
    cache1 = init_kv_cache(lcfg, B, cap, dtype=jnp.float32)
    hidden, cache1 = llama_forward(params["llama"], lcfg, embeds,
                                   position_ids=pos, attn_valid=valid,
                                   cache=cache1)
    want = lm_head(params["llama"], hidden[:, -1:, :])[:, 0]

    # two chunks
    got, cache2 = chunked_prefill(params, cfg, embeds, pos, valid, cap,
                                  chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache2.k), np.asarray(cache1.k),
                               atol=1e-5)
    assert int(cache2.write_idx) == S

    # decode one token from each cache: identical logits
    nxt = jnp.argmax(got, -1).astype(jnp.int32)
    h = embed_tokens(params["llama"], nxt[:, None])
    hid1, _ = llama_forward(params["llama"], lcfg, h,
                            position_ids=jnp.full((B, 1), S),
                            attn_valid=jnp.ones((B, 1), bool), cache=cache1)
    hid2, _ = llama_forward(params["llama"], lcfg, h,
                            position_ids=jnp.full((B, 1), S),
                            attn_valid=jnp.ones((B, 1), bool), cache=cache2)
    np.testing.assert_allclose(np.asarray(lm_head(params["llama"], hid1)),
                               np.asarray(lm_head(params["llama"], hid2)),
                               atol=2e-4)

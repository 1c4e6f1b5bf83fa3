"""Pipeline-parallel decoder vs the plain forward (CPU mesh, 2 stages)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.models.llama import (
    LlamaConfig,
    embed_tokens,
    init_llama_params,
    llama_forward,
)
from matryoshka_mm_tpu.parallel.pipeline import make_pp_mesh, pipelined_decoder

CFG = LlamaConfig.tiny_debug()  # 4 layers


@pytest.fixture(scope="module")
def setup():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    B, L = 4, 8
    ids = rng.integers(5, 100, (B, L)).astype(np.int32)
    embeds = embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    valid = jnp.ones((B, L), bool)
    return params, embeds, pos, valid


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (2, 4), (4, 4)])
def test_pipeline_matches_plain_forward(setup, n_stages, n_micro):
    params, embeds, pos, valid = setup
    want, _ = llama_forward(params, CFG, embeds, position_ids=pos,
                            attn_valid=valid)
    mesh = make_pp_mesh(n_stages, devices=jax.devices()[:n_stages])
    got = pipelined_decoder(params, CFG, embeds, pos, valid, mesh,
                            n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pipeline_gradients(setup):
    """ppermute transposes correctly: grads match the plain forward."""
    params, embeds, pos, valid = setup
    mesh = make_pp_mesh(2, devices=jax.devices()[:2])

    def loss_pp(e):
        return jnp.sum(pipelined_decoder(params, CFG, e, pos, valid, mesh,
                                         n_microbatches=2) ** 2)

    def loss_plain(e):
        h, _ = llama_forward(params, CFG, e, position_ids=pos,
                             attn_valid=valid)
        return jnp.sum(h ** 2)

    g_pp = jax.grad(loss_pp)(embeds)
    g_plain = jax.grad(loss_plain)(embeds)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_plain),
                               atol=5e-4)

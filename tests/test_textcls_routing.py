"""textcls router feature: frozen BERT prompt embedding concatenated into
the gating input, through the full m3 loss."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from matryoshka_mm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.models.llava import (
    LlavaConfig,
    init_llava_params,
    router_embed_dim,
)
from matryoshka_mm_tpu.train.train_step import M3Batch, m3_loss


def _cfg():
    base = LlavaConfig.tiny_debug(
        moe="t=dense_ft=cls,textcls_obj=weightedlm_loadb=switch_alpha=0.01_costt=count")
    return dataclasses.replace(
        base, router_feature_types=("cls", "textcls"), text_embed_dim=32)


def test_router_embed_dim_with_textcls():
    cfg = _cfg()
    assert router_embed_dim(cfg) == cfg.mm_hidden_size + 32


def test_m3_loss_with_text_embed():
    cfg = _cfg()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 10
    ids = rng.integers(5, 100, (B, T)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :5] = IGNORE_INDEX
    px = rng.standard_normal((B, 3, 56, 56)).astype(np.float32)
    text_embed = rng.standard_normal((B, 32)).astype(np.float32)

    batch = M3Batch(jnp.asarray(ids), jnp.asarray(px), jnp.asarray(labels),
                    jnp.ones((B, T), bool), jnp.asarray(text_embed))
    loss, metrics = m3_loss(params, cfg, batch)
    assert np.isfinite(float(loss))
    assert "moe/avg_gating_prob_0" in metrics

    # the text embedding must influence the gating probabilities
    batch2 = batch._replace(text_embed=jnp.asarray(
        rng.standard_normal((B, 32)).astype(np.float32)))
    _, metrics2 = m3_loss(params, cfg, batch2)
    assert (float(metrics["moe/avg_gating_prob_0"])
            != float(metrics2["moe/avg_gating_prob_0"]))

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.models.llava import (
    LlavaConfig,
    forward_spliced,
    init_llava_params,
    prepare_multimodal,
    project,
    splice_capacity,
)


@pytest.fixture(scope="module")
def cfg():
    return LlavaConfig.tiny_debug()


@pytest.fixture(scope="module")
def moe_cfg():
    return LlavaConfig.tiny_debug(moe="t=dense_ft=cls_obj=weightedlm")


@pytest.fixture(scope="module")
def params(cfg):
    return init_llava_params(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="module")
def moe_params(moe_cfg):
    return init_llava_params(jax.random.PRNGKey(0), moe_cfg)


def _batch(cfg, B=2, T=10):
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 100, (B, T)).astype(np.int32)
    ids[:, 3] = IMAGE_TOKEN_INDEX
    px = rng.standard_normal(
        (B, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    labels = rng.integers(5, 100, (B, T)).astype(np.int32)
    return jnp.asarray(ids), jnp.asarray(px), jnp.asarray(labels)


def test_config_properties(cfg, moe_cfg):
    assert cfg.is_m3 and not cfg.is_m3_moe
    assert moe_cfg.is_m3_moe
    assert cfg.tokscale_list == [1, 4, 16]


@pytest.mark.parametrize("numtoks", [1, 4, 16])
def test_project_scales(params, cfg, numtoks):
    px = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32))
    out = project(params, cfg, px, numtoks)
    assert out["image_features"].shape == (2, numtoks, cfg.llama.hidden_size)
    assert out["gating_prob"] is None


def test_gating_prob(moe_params, moe_cfg):
    px = jnp.asarray(np.random.default_rng(2).standard_normal(
        (3, 3, moe_cfg.vision.image_size, moe_cfg.vision.image_size)).astype(np.float32))
    out = project(moe_params, moe_cfg, px, 4)
    gp = np.asarray(out["gating_prob"])
    assert gp.shape == (3, 3)
    np.testing.assert_allclose(gp.sum(axis=1), 1.0, atol=1e-5)


def test_prepare_and_forward(params, cfg):
    ids, px, labels = _batch(cfg)
    numtoks = 4
    spliced, gp = prepare_multimodal(params, cfg, ids, px, numtoks=numtoks,
                                     labels=labels)
    L = splice_capacity(cfg, ids.shape[1], numtoks)
    assert spliced.embeds.shape == (2, L, cfg.llama.hidden_size)
    # one sentinel replaced by numtoks feature rows
    assert np.asarray(spliced.lengths).tolist() == [10 - 1 + 4] * 2
    # image rows carry IGNORE labels
    lab = np.asarray(spliced.labels)
    assert (lab[:, 3:3 + numtoks] == IGNORE_INDEX).all()

    logits = forward_spliced(params, cfg, spliced)
    assert logits.shape == (2, L, cfg.llama.vocab_size)
    assert logits.dtype == jnp.float32


def test_visual_token_counts_all_scales(params, cfg):
    """Bit-exact token counts across the scale sweep (BASELINE.md)."""
    ids, px, labels = _batch(cfg)
    for numtoks in cfg.tokscale_list:
        spliced, _ = prepare_multimodal(params, cfg, ids, px, numtoks=numtoks)
        want = 10 - 1 + numtoks
        assert np.asarray(spliced.lengths).tolist() == [want, want]

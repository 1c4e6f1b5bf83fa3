"""Anyres (LLaVA-NeXT) multi-tile path: token counts and generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.models.clip import ClipVisionConfig
from matryoshka_mm_tpu.models.llama import LlamaConfig
from matryoshka_mm_tpu.models.llava import (
    LlavaConfig,
    M3Preset,
    encode_anyres_features,
    init_llava_params,
    unpad_image_features,
)

PINPOINTS = "[(112, 56), (56, 112), (112, 112)]"  # in units of the 56px tile


@pytest.fixture(scope="module")
def cfg():
    return LlavaConfig(
        llama=LlamaConfig.tiny_debug(),
        vision=ClipVisionConfig.tiny_debug(),
        preset=M3Preset(matryoshka_vis_token_scale="ver=v0_numtoks=[1,4,16]"),
        mm_patch_merge_type="spatial_unpad",
        image_aspect_ratio="anyres",
        image_grid_pinpoints=PINPOINTS,
        tokenizer_model_max_length=256,
    )


@pytest.fixture(scope="module")
def params(cfg):
    return init_llava_params(jax.random.PRNGKey(0), cfg)


def test_image_newline_param_exists(params, cfg):
    assert "image_newline" in params
    assert params["image_newline"].shape == (cfg.llama.hidden_size,)


def test_unpad_crops_tall_image():
    grid = jnp.zeros((8, 12, 12))
    out = unpad_image_features(grid, (100, 300), (12, 12))  # tall original
    assert out.shape[2] < 12 and out.shape[1] == 12
    out = unpad_image_features(grid, (300, 100), (12, 12))  # wide original
    assert out.shape[1] < 12 and out.shape[2] == 12


def test_anyres_token_count_square(params, cfg):
    """Square image -> 2x2 grid + base; unpad keeps the full grid and adds
    one newline token per merged row."""
    T = 5  # base + 4 tiles (2x2 grid of 56px tiles at 112x112)
    px = jnp.asarray(np.random.default_rng(0).standard_normal(
        (T, 3, 56, 56)).astype(np.float32))
    numtoks = 16  # 4x4 pooled grid per tile
    feats = encode_anyres_features(params, cfg, px, (500, 500), numtoks)
    # base 16 + grid (2*4 rows) x (2*4 cols + 1 newline) = 16 + 8*9 = 88
    assert feats.shape == (88, cfg.llama.hidden_size)


def test_anyres_flat_merge(params, cfg):
    import dataclasses

    flat_cfg = dataclasses.replace(cfg, mm_patch_merge_type="flat")
    px = jnp.asarray(np.random.default_rng(1).standard_normal(
        (3, 3, 56, 56)).astype(np.float32))
    feats = encode_anyres_features(params, flat_cfg, px, (112, 56), 4)
    assert feats.shape == (3 * 4, flat_cfg.llama.hidden_size)


def test_anyres_generate(params, cfg):
    from matryoshka_mm_tpu.generate import GenerationConfig, generate

    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42]], np.int32)
    px = np.random.default_rng(2).standard_normal(
        (1, 5, 3, 56, 56)).astype(np.float32)
    out = generate(params, cfg, ids, px, image_sizes=[(500, 500)],
                   matryoshka_vis_token_scale="ver=v0_numtoks=16",
                   gen_cfg=GenerationConfig(max_new_tokens=4))
    assert out.shape[0] == 1
    out2 = generate(params, cfg, ids, px, image_sizes=[(500, 500)],
                    matryoshka_vis_token_scale="ver=v0_numtoks=16",
                    gen_cfg=GenerationConfig(max_new_tokens=4))
    np.testing.assert_array_equal(out, out2)


def test_anyres_token_count_matches_encoder(params, cfg):
    """anyres_token_count (used by serving admission) must equal the
    actual merged feature length for every pinpoint shape."""
    from matryoshka_mm_tpu.models.llava import anyres_token_count

    rng = np.random.default_rng(1)
    for size, T in [((500, 500), 5), ((300, 120), 3), ((120, 300), 3),
                    ((640, 480), 5)]:
        px = jnp.asarray(rng.standard_normal((T, 3, 56, 56)).astype(np.float32))
        feats = encode_anyres_features(params, cfg, px, size, 16)
        assert anyres_token_count(cfg, size, T, 16) == feats.shape[0], size


def test_anyres_stream_generate(params, cfg):
    """stream_generate handles 5D anyres input and matches generate()."""
    from matryoshka_mm_tpu.generate import GenerationConfig, generate, stream_generate

    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42]], np.int32)
    px = np.random.default_rng(2).standard_normal(
        (1, 5, 3, 56, 56)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=6, eos_token_id=-1)
    want = generate(params, cfg, ids, px, image_sizes=[(500, 500)],
                    matryoshka_vis_token_scale="ver=v0_numtoks=16",
                    gen_cfg=gen_cfg)[0]
    chunks = list(stream_generate(params, cfg, ids, px,
                                  image_sizes=[(500, 500)],
                                  matryoshka_vis_token_scale="ver=v0_numtoks=16",
                                  gen_cfg=gen_cfg))
    got = chunks[-1][0]
    np.testing.assert_array_equal(got[: len(want)], want)


def test_anyres_beam_width_one_matches_greedy(params, cfg):
    from matryoshka_mm_tpu.generate import (GenerationConfig, beam_generate,
                                            generate)

    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42]], np.int32)
    px = np.random.default_rng(3).standard_normal(
        (1, 5, 3, 56, 56)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
    greedy = generate(params, cfg, ids, px, image_sizes=[(500, 500)],
                      matryoshka_vis_token_scale="ver=v0_numtoks=16",
                      gen_cfg=gen_cfg)[0]
    beam = beam_generate(params, cfg, ids, px, image_sizes=[(500, 500)],
                         matryoshka_vis_token_scale="ver=v0_numtoks=16",
                         num_beams=1, gen_cfg=gen_cfg)[0]
    assert list(beam) == list(greedy)

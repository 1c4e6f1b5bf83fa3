import numpy as np
import jax
import jax.numpy as jnp

from matryoshka_mm_tpu.models.clip import (
    ClipVisionConfig,
    clip_vision_forward,
    init_clip_params,
    s2_multiscale_forward,
)

CFG = ClipVisionConfig.tiny_debug()  # 56px, 4x4 patch grid


def test_s2_shapes():
    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    px = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, 112, 112)).astype(np.float32))
    out = s2_multiscale_forward(params, px, CFG, scales=(56, 112))
    assert out.shape == (2, 16, CFG.hidden_size * 2)


def test_s2_base_scale_matches_single_forward():
    params = init_clip_params(jax.random.PRNGKey(1), CFG)
    px = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 56, 56)).astype(np.float32))
    out = s2_multiscale_forward(params, px, CFG, scales=(56,))
    want = clip_vision_forward(params, px, CFG)["patch"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_s2_jit_compiles():
    params = init_clip_params(jax.random.PRNGKey(2), CFG)
    px = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 3, 112, 112)).astype(np.float32))
    f = jax.jit(lambda p, x: s2_multiscale_forward(p, x, CFG, scales=(56, 112)))
    out = f(params, px)
    assert np.isfinite(np.asarray(out)).all()

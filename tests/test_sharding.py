"""pjit sharding: params FSDP/TP-sharded over a (data, model) mesh, batch on
the data axis; train step and inference compile + run on the virtual
8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from matryoshka_mm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
from matryoshka_mm_tpu.parallel import batch_sharding, make_mesh, param_shardings, shard_params
from matryoshka_mm_tpu.train.optimizer import OptimizerConfig
from matryoshka_mm_tpu.train.train_step import M3Batch
from matryoshka_mm_tpu.train.trainer import create_train_state, make_train_step


def _batch(cfg, B=4, T=12):
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 100, (B, T)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :6] = IGNORE_INDEX
    px = rng.standard_normal(
        (B, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    return M3Batch(jnp.asarray(ids), jnp.asarray(px), jnp.asarray(labels),
                   jnp.ones((B, T), bool))


def test_param_shardings_rules(mesh8):
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    sh = param_shardings(mesh8, params)
    q = sh["llama"]["layers"]["self_attn"]["q_proj"]
    # stacked layer leaf, (out, in) storage: (n_layers, H*Dh, D) ->
    # (None, 'model', 'data')
    assert q.spec == P(None, "model", "data")
    assert sh["llama"]["norm"].spec in (P(), P(None))


def test_sharded_train_step(mesh8):
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    with mesh8:
        params = shard_params(mesh8, params)
        state, tx = create_train_state(params, OptimizerConfig(total_steps=4))
        step = make_train_step(cfg, tx, donate=False)
        batch = _batch(cfg)
        batch = jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh8)), batch)
        state1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params stayed sharded
    q = state1.params["llama"]["layers"]["self_attn"]["q_proj"]
    assert not q.sharding.is_fully_replicated


def test_sharded_equals_unsharded(mesh8):
    """One train step on the mesh must match the single-device result."""
    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)

    state_ref, tx = create_train_state(params, OptimizerConfig(total_steps=4))
    step_ref = make_train_step(cfg, tx, donate=False)
    _, metrics_ref = step_ref(state_ref, batch)

    with mesh8:
        sharded = shard_params(mesh8, params)
        state_sh, tx2 = create_train_state(sharded, OptimizerConfig(total_steps=4))
        step_sh = make_train_step(cfg, tx2, donate=False)
        b = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh8)), batch)
        _, metrics_sh = step_sh(state_sh, b)

    np.testing.assert_allclose(float(metrics_ref["loss"]),
                               float(metrics_sh["loss"]), rtol=2e-5)


def test_sharded_generate(mesh8):
    from matryoshka_mm_tpu.generate import GenerationConfig, generate

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42]], np.int32)
    px = np.random.default_rng(1).standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    plain = generate(params, cfg, ids, px,
                     matryoshka_vis_token_scale="ver=v0_numtoks=4",
                     gen_cfg=GenerationConfig(max_new_tokens=4))
    with mesh8:
        sharded = shard_params(mesh8, params)
        out = generate(sharded, cfg, ids, px,
                       matryoshka_vis_token_scale="ver=v0_numtoks=4",
                       gen_cfg=GenerationConfig(max_new_tokens=4))
    np.testing.assert_array_equal(plain, out)

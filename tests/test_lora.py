"""LoRA adapters: wrapper semantics, gradient flow, QLoRA, train step."""

import numpy as np
import jax
import jax.numpy as jnp

from matryoshka_mm_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_logits,
)
from matryoshka_mm_tpu.ops.lora import (
    add_lora,
    count_lora_params,
    extract_lora,
    is_lora,
    load_lora,
    merge_lora_weights,
    strip_lora,
)
from matryoshka_mm_tpu.ops.quant import tree_nbytes

CFG = LlamaConfig.tiny_debug()


def _params():
    return init_llama_params(jax.random.PRNGKey(0), CFG)


def test_lora_init_is_identity():
    """B=0 at init: wrapped model == base model exactly."""
    params = _params()
    lp = add_lora(params, jax.random.PRNGKey(1), r=4, alpha=8.0)
    assert is_lora(lp["layers"]["self_attn"]["q_proj"])
    ids = jnp.arange(8).reshape(1, 8)
    np.testing.assert_allclose(np.asarray(llama_logits(params, CFG, ids)),
                               np.asarray(llama_logits(lp, CFG, ids)),
                               atol=1e-6)


def test_lora_grads_only_adapters():
    """Base weights are stop-gradiented; only A/B (and non-wrapped leaves)
    receive nonzero grads after perturbing B."""
    params = _params()
    lp = add_lora(params, jax.random.PRNGKey(2), r=4, alpha=8.0)
    # make B nonzero so A also gets signal
    lp = jax.tree.map(lambda x: x, lp)
    leaf = lp["layers"]["self_attn"]["q_proj"]
    leaf["lora_b"] = jax.random.normal(jax.random.PRNGKey(3),
                                       leaf["lora_b"].shape) * 0.02
    ids = jnp.arange(8).reshape(1, 8)

    def loss(p):
        return jnp.sum(llama_logits(p, CFG, ids) ** 2)

    g = jax.grad(loss)(lp)
    gleaf = g["layers"]["self_attn"]["q_proj"]
    assert float(jnp.abs(gleaf["lora_a"]).max()) > 0
    assert float(jnp.abs(gleaf["lora_b"]).max()) > 0
    assert float(jnp.abs(gleaf["w"]).max()) == 0.0        # frozen base


def test_lora_merge_strip_roundtrip():
    params = _params()
    lp = add_lora(params, jax.random.PRNGKey(4), r=4, alpha=8.0)
    leaf = lp["layers"]["mlp"]["gate_proj"]
    leaf["lora_b"] = jnp.ones_like(leaf["lora_b"]) * 0.01
    ids = jnp.arange(8).reshape(1, 8)
    want = np.asarray(llama_logits(lp, CFG, ids))

    merged = merge_lora_weights(lp)
    assert not is_lora(merged["layers"]["mlp"]["gate_proj"])
    got = np.asarray(llama_logits(merged, CFG, ids))
    np.testing.assert_allclose(got, want, atol=1e-4)

    base = strip_lora(lp)
    np.testing.assert_array_equal(
        np.asarray(base["layers"]["self_attn"]["q_proj"]),
        np.asarray(params["layers"]["self_attn"]["q_proj"]))


def test_lora_extract_load_roundtrip():
    params = _params()
    lp = add_lora(params, jax.random.PRNGKey(5), r=4, alpha=8.0)
    leaf = lp["layers"]["self_attn"]["v_proj"]
    leaf["lora_b"] = jnp.ones_like(leaf["lora_b"]) * 0.03
    adapters = extract_lora(lp)
    assert "layers" in adapters
    re_attached = load_lora(params, adapters)
    ids = jnp.arange(8).reshape(1, 8)
    np.testing.assert_allclose(np.asarray(llama_logits(re_attached, CFG, ids)),
                               np.asarray(llama_logits(lp, CFG, ids)),
                               atol=1e-6)
    # adapters are small
    assert tree_nbytes(adapters) < 0.2 * tree_nbytes(params)
    assert count_lora_params(lp) > 0


def test_qlora_int8_base():
    """LoRA over an int8-quantized base (QLoRA) runs and starts at the
    quantized model's outputs."""
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params

    params = _params()
    qp = quantize_llama_params(params, min_size=1024)
    qlp = add_lora(qp, jax.random.PRNGKey(6), r=4, alpha=8.0)
    ids = jnp.arange(8).reshape(1, 8)
    np.testing.assert_allclose(np.asarray(llama_logits(qp, CFG, ids)),
                               np.asarray(llama_logits(qlp, CFG, ids)),
                               atol=1e-5)


def test_lora_train_step_updates_only_adapters():
    """End-to-end M3 train step with lora_enable: loss finite, adapters
    move, base backbone weights do not."""
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.train.optimizer import OptimizerConfig
    from matryoshka_mm_tpu.train.train_step import M3Batch
    from matryoshka_mm_tpu.train.trainer import create_train_state, make_train_step

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    params = add_lora(params, jax.random.PRNGKey(1), r=4, alpha=8.0)

    opt_cfg = OptimizerConfig(learning_rate=1e-2, total_steps=4,
                              lr_schedule="constant", warmup_ratio=0.0,
                              lora_enable=True)
    state, tx = create_train_state(params, opt_cfg)
    step_fn = make_train_step(cfg, tx, donate=False)

    rng = np.random.default_rng(0)
    B, T = 2, 16
    ids = rng.integers(5, 100, (B, T)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :4] = -100
    batch = M3Batch(
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(
            rng.standard_normal((B, 3, 56, 56)).astype(np.float32)),
        labels=jnp.asarray(labels),
        attn_mask=jnp.ones((B, T), bool),
    )

    w0 = np.asarray(
        state.params["llama"]["layers"]["self_attn"]["q_proj"]["w"])
    b0 = np.asarray(
        state.params["llama"]["layers"]["self_attn"]["q_proj"]["lora_b"])
    for _ in range(2):
        state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    w1 = np.asarray(
        state.params["llama"]["layers"]["self_attn"]["q_proj"]["w"])
    b1 = np.asarray(
        state.params["llama"]["layers"]["self_attn"]["q_proj"]["lora_b"])
    np.testing.assert_array_equal(w0, w1)          # base frozen
    assert np.abs(b1 - b0).max() > 0               # adapters trained


def test_lora_checkpoint_roundtrip(tmp_path):
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.utils.checkpoint import (
        load_checkpoint, save_lora_checkpoint)

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    params = add_lora(params, jax.random.PRNGKey(1), r=4, alpha=8.0)
    leaf = params["llama"]["layers"]["self_attn"]["q_proj"]
    leaf["lora_b"] = jnp.ones_like(leaf["lora_b"]) * 0.05

    out = str(tmp_path / "lora_ckpt")
    save_lora_checkpoint(out, params, cfg, step=7)
    restored, _ = load_checkpoint(out)
    assert "lora" in restored and "mm_projector" in restored
    re_attached = load_lora(strip_lora(params), restored["lora"])
    got = np.asarray(
        re_attached["llama"]["layers"]["self_attn"]["q_proj"]["lora_b"])
    np.testing.assert_allclose(got, 0.05, atol=1e-7)


def test_qlora_train_step_end_to_end():
    """QLoRA through the real train step: int8 frozen base + LoRA
    adapters; grads flow (allow_int for integer leaves), adapters move,
    quantized base bytes unchanged."""
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params
    from matryoshka_mm_tpu.train.optimizer import OptimizerConfig
    from matryoshka_mm_tpu.train.train_step import M3Batch
    from matryoshka_mm_tpu.train.trainer import create_train_state, make_train_step

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    params["llama"] = quantize_llama_params(params["llama"], min_size=1024)
    params = add_lora(params, jax.random.PRNGKey(1), r=4, alpha=8.0)

    opt_cfg = OptimizerConfig(learning_rate=1e-2, total_steps=4,
                              lr_schedule="constant", warmup_ratio=0.0,
                              lora_enable=True)
    state, tx = create_train_state(params, opt_cfg)
    step_fn = make_train_step(cfg, tx, donate=False)

    rng = np.random.default_rng(0)
    B, T = 2, 16
    ids = rng.integers(5, 100, (B, T)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :4] = -100
    batch = M3Batch(
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(
            rng.standard_normal((B, 3, 56, 56)).astype(np.float32)),
        labels=jnp.asarray(labels),
        attn_mask=jnp.ones((B, T), bool),
    )

    leaf0 = state.params["llama"]["layers"]["self_attn"]["q_proj"]
    q0 = np.asarray(leaf0["w"]["qint8"])
    b0 = np.asarray(leaf0["lora_b"])
    for _ in range(2):
        state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    leaf1 = state.params["llama"]["layers"]["self_attn"]["q_proj"]
    np.testing.assert_array_equal(q0, np.asarray(leaf1["w"]["qint8"]))
    assert np.abs(np.asarray(leaf1["lora_b"]) - b0).max() > 0

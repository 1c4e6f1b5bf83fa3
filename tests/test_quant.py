import numpy as np
import jax
import jax.numpy as jnp

from matryoshka_mm_tpu.models.llama import LlamaConfig, init_llama_params, llama_logits
from matryoshka_mm_tpu.ops.quant import (
    dequantize_array,
    is_quantized,
    quantize_array,
    quantize_llama_params,
    tree_nbytes,
)

CFG = LlamaConfig.tiny_debug()


def test_quantize_roundtrip_error():
    w = np.random.default_rng(0).standard_normal((64, 128)).astype(np.float32)
    q = quantize_array(jnp.asarray(w))
    assert is_quantized(q)
    deq = np.asarray(dequantize_array(q, jnp.float32))
    # per-output-channel int8 (weights stored (out, in), scale over in):
    # relative error bounded by half a quantization step
    row_max = np.abs(w).max(axis=1)
    np.testing.assert_array_less(np.abs(deq - w).max(axis=1),
                                 row_max / 127.0 + 1e-6)


def test_quantized_llama_runs_and_matches():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_llama_params(params, min_size=1024)
    ids = jnp.arange(8).reshape(1, 8)
    full = np.asarray(llama_logits(params, CFG, ids))
    quant = np.asarray(llama_logits(qparams, CFG, ids))
    # int8 weights shift logits slightly; argmax should mostly agree
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.5
    assert np.isfinite(quant).all()


def test_memory_savings():
    cfg = LlamaConfig.tiny_debug(hidden_size=128, intermediate_size=256)
    params = init_llama_params(jax.random.PRNGKey(1), cfg)
    q = quantize_llama_params(params, min_size=1024)
    assert tree_nbytes(q) < 0.45 * tree_nbytes(params)


def test_load_4bit_flag():
    from matryoshka_mm_tpu.models.builder import load_pretrained_model

    tok, model, proc, ctx = load_pretrained_model(
        "debug://tiny", None, "tiny", load_8bit=True)
    # int8 inference layout fuses qkv like int4 (one fused kernel/group)
    assert is_quantized(model.params["llama"]["layers"]["self_attn"]["qkv_proj"])
    out = model.generate(np.array([[5, 6, 7]], np.int32), max_new_tokens=3)
    assert out.shape[0] == 1
    # unfused layout preserved for LoRA wrapping
    tok2, m2, _, _ = load_pretrained_model(
        "debug://tiny", None, "tiny", load_8bit=True, quant_fuse=False)
    assert is_quantized(m2.params["llama"]["layers"]["self_attn"]["q_proj"])


def test_int4_roundtrip():
    from matryoshka_mm_tpu.ops.quant import dequantize_array, quantize_array_int4

    w = np.random.default_rng(3).standard_normal((64, 128)).astype(np.float32)
    q = quantize_array_int4(jnp.asarray(w))
    assert q["qint4"].shape == (64, 64)  # pairs packed along the in dim
    deq = np.asarray(dequantize_array(q, jnp.float32))
    assert deq.shape == w.shape
    # int4: error bounded by half a step of the per-output-channel scale
    row_max = np.abs(w).max(axis=1)
    np.testing.assert_array_less(np.abs(deq - w).max(axis=1),
                                 row_max / 7.0 + 1e-6)


def test_int4_stacked_and_memory():
    from matryoshka_mm_tpu.ops.quant import (
        dequantize_array, quantize_llama_params_int4, tree_nbytes)

    cfg = LlamaConfig.tiny_debug(hidden_size=128, intermediate_size=256)
    params = init_llama_params(jax.random.PRNGKey(2), cfg)
    q = quantize_llama_params_int4(params, min_size=1024)
    assert tree_nbytes(q) < 0.3 * tree_nbytes(params)
    # int4 quantization fuses q/k/v into one stacked qkv leaf (one fused
    # kernel launch per group at decode); dequantized shape = concat
    leaf = q["layers"]["self_attn"]["qkv_proj"]
    deq = dequantize_array(leaf, jnp.float32)
    qp = params["layers"]["self_attn"]["q_proj"]
    assert deq.shape == (qp.shape[0], 3 * qp.shape[1], qp.shape[2])
    ref = jnp.concatenate([params["layers"]["self_attn"][n]
                           for n in ("q_proj", "k_proj", "v_proj")], axis=1)
    err = jnp.max(jnp.abs(deq - ref))
    row_max = jnp.max(jnp.abs(ref), axis=-1)
    assert float(err) <= float(jnp.max(row_max)) / 7.0 + 1e-6
    # unfused layout still available for LoRA/delta tools
    q2 = quantize_llama_params_int4(params, min_size=1024, fuse=False)
    assert "q_proj" in q2["layers"]["self_attn"]


def test_int4_fused_matmul_interpret():
    """The Pallas kernel (interpret mode) matches dequantize+matmul."""
    from matryoshka_mm_tpu.ops.int4_matmul import (int4_matmul,
                                                   int4_matmul_stacked)
    from matryoshka_mm_tpu.ops.quant import (dequantize_array,
                                             quantize_array_int4)

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((3, 128, 256)), jnp.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((2, 256)), jnp.bfloat16)
    leaves = [quantize_array_int4(w[i]) for i in range(3)]
    packed = jnp.stack([l["qint4"] for l in leaves])
    scale = jnp.stack([l["scale"] for l in leaves])
    for i in range(3):
        ref = x.astype(jnp.float32) @ dequantize_array(
            leaves[i], jnp.float32).T
        got = int4_matmul(x, leaves[i]["qint4"], leaves[i]["scale"],
                          interpret=True)
        rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert rel < 0.01, rel
        got_s = int4_matmul_stacked(x, packed, scale, jnp.int32(i),
                                    interpret=True)
        rel = float(jnp.max(jnp.abs(got_s.astype(jnp.float32) - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert rel < 0.01, rel


def test_load_4bit_generate():
    from matryoshka_mm_tpu.models.builder import load_pretrained_model
    from matryoshka_mm_tpu.ops.quant import is_quantized

    tok, model, proc, ctx = load_pretrained_model(
        "debug://tiny", None, "tiny", load_4bit=True)
    leaf = model.params["llama"]["layers"]["self_attn"]["qkv_proj"]
    assert is_quantized(leaf) and "qint4" in leaf
    out = model.generate(np.array([[5, 6, 7]], np.int32), max_new_tokens=3)
    assert out.shape[0] == 1


def test_disable_fused_proj_gate():
    """The fused Pallas dequant-matmul has no AD rule; traces that will be
    differentiated disable it via the context gate (ADVICE r2).  The gate
    nests and restores."""
    import matryoshka_mm_tpu.ops.quant as Q

    assert Q._FUSED_PROJ_ENABLED[-1]
    with Q.disable_fused_proj():
        assert not Q._FUSED_PROJ_ENABLED[-1]
        from matryoshka_mm_tpu.ops.quant import quantize_array_int4

        # fused path must refuse regardless of leaf eligibility
        x = jnp.ones((2, 256), jnp.bfloat16)
        leaf = quantize_array_int4(
            jnp.asarray(np.random.default_rng(0)
                        .standard_normal((128, 256)), jnp.float32))
        assert Q.fused_int4_proj(x, leaf) is None
        with Q.disable_fused_proj():
            assert not Q._FUSED_PROJ_ENABLED[-1]
        assert not Q._FUSED_PROJ_ENABLED[-1]
    assert Q._FUSED_PROJ_ENABLED[-1]


def test_qlora_grad_through_quantized_base():
    """jax.grad through a QLoRA (int8 base + LoRA) llama forward: the
    differentiable dequant+dot path must carry adapter grads (ADVICE r2:
    the fused kernel would fail at grad trace time if not gated)."""
    from matryoshka_mm_tpu.models.llama import (LlamaConfig,
                                                init_llama_params,
                                                llama_logits)
    from matryoshka_mm_tpu.ops.lora import add_lora
    from matryoshka_mm_tpu.ops.quant import quantize_llama_params

    cfg = LlamaConfig.tiny_debug()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_llama_params(params, min_size=1024)
    qlp = add_lora(qp, jax.random.PRNGKey(1), r=4, alpha=8.0)
    leaf = qlp["layers"]["self_attn"]["q_proj"]
    leaf["lora_b"] = jax.random.normal(jax.random.PRNGKey(2),
                                       leaf["lora_b"].shape) * 0.02
    ids = jnp.arange(8).reshape(1, 8)

    def loss(p):
        return jnp.sum(llama_logits(p, cfg, ids).astype(jnp.float32) ** 2)

    g = jax.grad(loss, allow_int=True)(qlp)
    gleaf = g["layers"]["self_attn"]["q_proj"]
    assert float(jnp.abs(gleaf["lora_a"]).max()) > 0
    assert float(jnp.abs(gleaf["lora_b"]).max()) > 0

"""On-chip smoke test: compiled-kernel parity checks that the CPU test
suite can only run in interpret mode.

Usage: ``python scripts/tpu_smoke.py`` on a machine with a TPU attached.
Validates, compiled on the real chip:

* Pallas flash attention forward + backward vs the jnp reference;
* the Pallas paged-attention decode kernel vs the gathered reference;
* an end-to-end debug-model generate (flash prefill + cached decode);
* speculative decoding self-consistency.

Exits nonzero on any mismatch.  Runtime ~2-4 minutes (compiles dominate).
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def check(name, ok, detail=""):
    print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}")
    if not ok:
        sys.exit(1)


def main():
    assert jax.default_backend() == "tpu", \
        f"needs a TPU (got {jax.default_backend()})"
    rng = np.random.default_rng(0)

    # ---- flash attention fwd/bwd ----
    from matryoshka_mm_tpu.ops.attention import attention_reference
    from matryoshka_mm_tpu.ops.flash_attention import flash_attention

    B, H, S, Dh = 2, 4, 512, 128
    q = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
    got = np.asarray(jax.jit(lambda q, k, v: flash_attention(q, k, v))(q, k, v))
    want = np.asarray(attention_reference(q, k, v, causal=True))
    err = np.abs(got - want).max()
    check("flash fwd (compiled)", err < 2e-2, f"max_err={err:.2e}")

    def loss_f(q):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_r(q):
        return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

    g1 = np.asarray(jax.jit(jax.grad(loss_f))(q))
    g2 = np.asarray(jax.jit(jax.grad(loss_r))(q))
    rel = np.abs(g1 - g2).max() / (np.abs(g2).max() + 1e-9)
    check("flash bwd (compiled)", rel < 5e-2, f"rel_err={rel:.2e}")

    # ---- paged attention kernel ----
    from matryoshka_mm_tpu.ops.paged_attention import paged_decode_attention

    PAGE, NP, P = 16, 12, 4
    qd = jnp.asarray(rng.standard_normal((2, 4, 128)).astype(np.float32))
    kp = jnp.asarray(rng.standard_normal((NP, PAGE, 4, 128)).astype(np.float32))
    vp = jnp.asarray(rng.standard_normal((NP, PAGE, 4, 128)).astype(np.float32))
    tables = jnp.asarray(rng.permutation(NP)[: 2 * P].reshape(2, P).astype(np.int32))
    row_len = jnp.asarray([30, 50], jnp.int32)
    got = np.asarray(paged_decode_attention(qd, kp, vp, tables, row_len))
    outs = []
    for b in range(2):
        kr = kp[np.asarray(tables)[b]].reshape(P * PAGE, 4, 128)
        vr = vp[np.asarray(tables)[b]].reshape(P * PAGE, 4, 128)
        n = int(row_len[b]) + 1
        o = attention_reference(
            qd[b: b + 1, :, None, :], jnp.asarray(kr)[None].transpose(0, 2, 1, 3),
            jnp.asarray(vr)[None].transpose(0, 2, 1, 3), causal=False,
            kv_valid=jnp.asarray((np.arange(P * PAGE) < n)[None]))
        outs.append(np.asarray(o[0, :, 0]))
    err = np.abs(got - np.stack(outs)).max()
    check("paged-attention kernel (compiled)", err < 5e-3, f"max_err={err:.2e}")

    # ---- end-to-end debug model ----
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import (GenerationConfig, generate,
                                            speculative_generate)
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=12, decode_chunk=4,
                               eos_token_id=-1)
    out = generate(params, cfg, ids, px,
                   matryoshka_vis_token_scale="ver=v0_numtoks=4",
                   gen_cfg=gen_cfg)
    check("generate e2e", out.shape == (1, 12), f"shape={out.shape}")

    spec = speculative_generate(params, cfg, ids, px,
                                matryoshka_vis_token_scale="ver=v0_numtoks=4",
                                gen_cfg=gen_cfg, k=4)
    check("speculative e2e", spec.shape[1] == 12, f"shape={spec.shape}")
    print("all TPU smoke checks passed")


if __name__ == "__main__":
    main()

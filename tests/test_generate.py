import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.generate import GenerationConfig, gating_probs, generate
from matryoshka_mm_tpu.models.llama import llama_logits
from matryoshka_mm_tpu.models.llava import (
    LlavaConfig,
    forward_spliced,
    init_llava_params,
    prepare_multimodal,
)

EOS = 2


@pytest.fixture(scope="module")
def cfg():
    return LlavaConfig.tiny_debug()


@pytest.fixture(scope="module")
def params(cfg):
    return init_llava_params(jax.random.PRNGKey(0), cfg)


def _naive_multimodal_greedy(params, cfg, ids, px, numtoks, steps):
    """Recompute-from-scratch greedy loop (no KV cache) as golden."""
    out = []
    cur_ids = np.asarray(ids)
    for _ in range(steps):
        spliced, _ = prepare_multimodal(
            params, cfg, jnp.asarray(cur_ids), px, numtoks=numtoks,
            out_len=cur_ids.shape[1] + numtoks + 8)
        logits = forward_spliced(params, cfg, spliced)
        last = int(np.asarray(spliced.lengths)[0]) - 1
        nxt = int(np.asarray(logits[0, last]).argmax())
        out.append(nxt)
        cur_ids = np.concatenate([cur_ids, [[nxt]]], axis=1)
    return out


def test_text_only_greedy_matches_naive(params, cfg):
    ids = np.array([[5, 17, 42, 9]], np.int32)
    gen_cfg = GenerationConfig(max_new_tokens=6, eos_token_id=EOS)
    got = generate(params, cfg, ids, gen_cfg=gen_cfg)[0]

    cur = ids.copy()
    want = []
    for _ in range(6):
        logits = llama_logits(params["llama"], cfg.llama, jnp.asarray(cur))
        nxt = int(np.asarray(logits[0, -1]).argmax())
        want.append(nxt)
        if nxt == EOS:
            break
        cur = np.concatenate([cur, [[nxt]]], axis=1)
    np.testing.assert_array_equal(got[: len(want)], want)


def test_multimodal_greedy_matches_naive(params, cfg):
    rng = np.random.default_rng(0)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
    px = jnp.asarray(rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32))
    gen_cfg = GenerationConfig(max_new_tokens=5, eos_token_id=EOS, decode_chunk=2)
    got = generate(params, cfg, ids, np.asarray(px),
                   matryoshka_vis_token_scale="ver=v0_numtoks=4",
                   gen_cfg=gen_cfg)[0]
    want = _naive_multimodal_greedy(params, cfg, ids, px, 4, 5)
    n = min(len(got), len(want))
    # compare until EOS
    for i in range(n):
        if want[i] == EOS:
            break
        assert got[i] == want[i], (i, got, want)


def test_batched_multimodal_greedy(params, cfg):
    """Two samples with different prompt lengths via left-padding."""
    rng = np.random.default_rng(1)
    ids = np.array([
        [0, 0, 5, IMAGE_TOKEN_INDEX, 9],
        [5, 17, IMAGE_TOKEN_INDEX, 42, 9],
    ], np.int32)
    px = rng.standard_normal(
        (2, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    # NOTE: row 0's leading zeros are real tokens here (no mask arg yet);
    # this test just checks batched execution is deterministic.
    got1 = generate(params, cfg, ids, px,
                    matryoshka_vis_token_scale="ver=v0_numtoks=4",
                    gen_cfg=GenerationConfig(max_new_tokens=4))
    got2 = generate(params, cfg, ids, px,
                    matryoshka_vis_token_scale="ver=v0_numtoks=4",
                    gen_cfg=GenerationConfig(max_new_tokens=4))
    np.testing.assert_array_equal(got1, got2)
    assert got1.shape[0] == 2


def test_v2_combine_single_beta_equals_single_scale(params, cfg):
    """betas=[0,1] puts all weight on the larger scale -> same tokens as
    running that scale alone."""
    rng = np.random.default_rng(2)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42]], np.int32)
    px = rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=4)
    combined = generate(params, cfg, ids, px,
                        matryoshka_vis_token_scale="ver=v2_numtoks=[1,16]_betas=[0,1]",
                        gen_cfg=gen_cfg)[0]
    single = generate(params, cfg, ids, px,
                      matryoshka_vis_token_scale="ver=v0_numtoks=16",
                      gen_cfg=gen_cfg)[0]
    np.testing.assert_array_equal(combined, single)


def test_gateprobargmax(params):
    cfg = LlavaConfig.tiny_debug(moe="t=dense_ft=cls_obj=weightedlm")
    p = init_llava_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42]], np.int32)
    px = rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    gp = np.asarray(gating_probs(p, cfg, px))
    assert gp.shape == (1, 3)
    out = generate(p, cfg, ids, px,
                   matryoshka_vis_token_scale="ver=v0_numtoks=gateprobargmax",
                   gen_cfg=GenerationConfig(max_new_tokens=3))
    assert out.shape[0] == 1

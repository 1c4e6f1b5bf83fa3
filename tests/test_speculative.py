"""Prompt-lookup speculative decoding: exactness vs vanilla greedy."""

import numpy as np
import jax
import pytest

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.generate import (
    GenerationConfig,
    _ngram_propose,
    generate,
    speculative_generate,
)
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params


@pytest.fixture(scope="module")
def model():
    cfg = LlavaConfig.tiny_debug()
    return cfg, init_llava_params(jax.random.PRNGKey(0), cfg)


def test_ngram_propose():
    ids = [1, 2, 3, 9, 9, 1, 2, 3, 7, 8, 1, 2, 3]
    # trailing [1,2,3] last occurred at 5..7 -> continues 7, 8, 1, 2
    assert _ngram_propose(ids, 4, 3) == [7, 8, 1, 2]
    # no earlier occurrence -> repeat last token
    assert _ngram_propose([4, 5, 6], 3, 3) == [6, 6, 6]
    # short continuation pads by repetition
    assert _ngram_propose([1, 2, 3, 5, 1, 2, 3], 3, 3)[0] == 5


@pytest.mark.parametrize("with_image", [False, True])
def test_speculative_matches_greedy(model, with_image):
    cfg, params = model
    rng = np.random.default_rng(0)
    if with_image:
        ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9, 17, 42, 9]], np.int32)
        px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
        scale = "ver=v0_numtoks=4"
    else:
        ids = rng.integers(5, 100, (1, 12)).astype(np.int32)
        px, scale = None, None
    gen_cfg = GenerationConfig(max_new_tokens=16, decode_chunk=4,
                               eos_token_id=-1)
    want = generate(params, cfg, ids, px,
                    matryoshka_vis_token_scale=scale, gen_cfg=gen_cfg)[0]
    got = speculative_generate(params, cfg, ids, px,
                               matryoshka_vis_token_scale=scale,
                               gen_cfg=gen_cfg, k=4, ngram=3)[0]
    np.testing.assert_array_equal(got[: len(want)], want)


def test_speculative_oracle_acceptance(model):
    """With an oracle proposer (the true continuation) every draft is
    accepted: far fewer verify steps, identical output."""
    cfg, params = model
    rng = np.random.default_rng(1)
    ids = rng.integers(5, 100, (1, 10)).astype(np.int32)
    gen_cfg = GenerationConfig(max_new_tokens=20, decode_chunk=4,
                               eos_token_id=-1)
    want = list(generate(params, cfg, ids, None, gen_cfg=gen_cfg)[0])

    calls = {"n": 0}
    prompt_len = ids.shape[1]

    def oracle(ids_all, k, ngram):
        calls["n"] += 1
        done = len(ids_all) - prompt_len          # tokens emitted so far
        cont = want[done: done + k]
        return (cont + [0] * k)[:k]

    got = speculative_generate(params, cfg, ids, None, gen_cfg=gen_cfg,
                               k=4, ngram=3, propose_fn=oracle)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # 20 tokens, 1 from prefill, 5 accepted per verify -> 4 verify calls
    assert calls["n"] <= 5


def test_speculative_eos_and_budget(model):
    """EOS inside an accepted draft stops the stream at the eos token."""
    cfg, params = model
    rng = np.random.default_rng(2)
    ids = rng.integers(5, 100, (1, 8)).astype(np.int32)
    gen_cfg = GenerationConfig(max_new_tokens=32, decode_chunk=4,
                               eos_token_id=-1)
    want = list(generate(params, cfg, ids, None, gen_cfg=gen_cfg)[0])
    # pretend token want[3] is eos: rerun both with that id as eos
    eos = int(want[3])
    g2 = GenerationConfig(max_new_tokens=32, decode_chunk=4, eos_token_id=eos)
    want2 = list(generate(params, cfg, ids, None, gen_cfg=g2)[0])
    got2 = list(speculative_generate(params, cfg, ids, None, gen_cfg=g2, k=4)[0])
    # both mask the eos to pad and stop; agree over vanilla's full output
    assert got2[: len(want2)] == want2
    assert eos not in got2


def test_speculative_with_int4_fused(model):
    """Speculative verify steps (Sq = k+1 rows) must run through the
    fused int4 path identically to vanilla greedy on the same weights."""
    import copy

    from matryoshka_mm_tpu.ops.quant import quantize_llama_params_int4

    cfg, params = model
    q = dict(params)
    q["llama"] = quantize_llama_params_int4(
        copy.deepcopy(params["llama"]), min_size=1024)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9, 42, 9, 42, 9]],
                   np.int32)
    px = np.random.default_rng(0).standard_normal((1, 3, 56, 56)
                                                  ).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=12, eos_token_id=-1)
    want = generate(q, cfg, ids, px,
                    matryoshka_vis_token_scale="ver=v0_numtoks=4",
                    gen_cfg=gen_cfg)[0]
    got = speculative_generate(q, cfg, ids, px,
                               matryoshka_vis_token_scale="ver=v0_numtoks=4",
                               gen_cfg=gen_cfg)[0]
    np.testing.assert_array_equal(got[: len(want)], want)

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


def _reference_v2_loop(params, cfg, ids, px, tokscales, steps, combine):
    """Torch port of the reference's patched greedy loop for ver=v2
    (reference: generationmixin_patch.py:168-270): K independent KV-cache
    streams advanced one token per step with a python loop, next-token
    logits combined in torch exactly as the reference does —
    betas-weighted sum with the adaptive plausibility cutoff gamma
    (:251-262) or entropy pickby (:263-270, compute_entropy :365-372) —
    then greedy argmax.  Used as golden for the fused scan decode."""
    import torch

    from matryoshka_mm_tpu.generate import _prefill_fn, _round_up
    from matryoshka_mm_tpu.models.llama import (embed_tokens, lm_head,
                                                llama_forward)

    T = ids.shape[1]
    L = _round_up(T - 1 + max(tokscales), 64)
    capacity = L + steps + 4

    caches, logits0 = [], []
    for n in tokscales:
        lg, cache, lengths, _ = _prefill_fn(cfg, n, L, capacity)(
            params, jnp.asarray(ids), jnp.asarray(px))
        caches.append(cache)
        logits0.append(np.asarray(lg, np.float32))
    lengths = np.asarray(lengths)

    def combine_torch(logits_list):
        lt = [torch.tensor(l) for l in logits_list]
        if combine["type"] == "avg":
            next_logits = sum(b * l for b, l in zip(combine["betas"], lt))
            gamma = combine.get("gamma", 0)
            if gamma > 0:
                cutoff = (torch.log(torch.tensor(gamma))
                          + next_logits.max(dim=-1, keepdim=True).values)
                next_logits = next_logits.masked_fill(lt[-1] < cutoff,
                                                      -float("inf"))
            return next_logits
        # pickby=entropy: score = -entropy, pick argmax score
        scores = []
        for l in lt:
            probs = torch.nn.functional.softmax(l, dim=-1)
            logprobs = torch.nn.functional.log_softmax(l, dim=-1)
            scores.append(torch.sum(probs * logprobs, dim=-1))  # -entropy
        inds = torch.argmax(torch.stack(scores), dim=0)
        return torch.cat([lt[i] for i in inds], 0)

    token = int(torch.argmax(combine_torch(logits0), dim=-1)[0])
    out = [token]
    pos = lengths.copy()
    for _ in range(steps - 1):
        logits_list = []
        for k in range(len(tokscales)):
            embeds = embed_tokens(params["llama"],
                                  jnp.asarray([[token]], jnp.int32))
            hidden, caches[k] = llama_forward(
                params["llama"], cfg.llama, embeds,
                position_ids=jnp.asarray(pos[:, None]),
                attn_valid=jnp.ones((1, 1), bool), cache=caches[k])
            logits_list.append(
                np.asarray(lm_head(params["llama"], hidden[:, 0:1, :])[:, 0],
                           np.float32))
        token = int(torch.argmax(combine_torch(logits_list), dim=-1)[0])
        out.append(token)
        pos = pos + 1
    return out


@pytest.mark.parametrize("spec,combine", [
    ("ver=v2_numtoks=[4,16]_betas=[1.0,0.5]_gamma=0.1",
     {"type": "avg", "betas": [1.0, 0.5], "gamma": 0.1}),
    ("ver=v2_numtoks=[1,4,16]_pickby=entropy",
     {"type": "score"}),
])
def test_v2_combine_matches_reference_loop(params, cfg, spec, combine):
    """Token-for-token parity of the fused v2 combine-logits scan decode
    against the torch port of the reference's per-step loop, >=20 steps."""
    rng = np.random.default_rng(3)
    ids = rng.integers(5, 90, (1, 7)).astype(np.int32)
    ids[0, 2] = IMAGE_TOKEN_INDEX
    px = rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)

    steps = 22
    tokscales = [int(s) for s in
                 spec.split("numtoks=[")[1].split("]")[0].split(",")]
    want = _reference_v2_loop(params, cfg, ids, px, tokscales, steps, combine)
    got = generate(params, cfg, ids, px,
                   matryoshka_vis_token_scale=spec,
                   gen_cfg=GenerationConfig(max_new_tokens=steps,
                                            eos_token_id=-1))
    np.testing.assert_array_equal(np.asarray(got[0]), want)


def test_multi_image_greedy_matches_naive(params, cfg):
    """Multi-image prompts (M distinct images, M sentinels): generate()
    matches a recompute-from-scratch loop over manually multi-spliced
    embeddings — image i's features at sentinel i, in order (reference:
    llava_arch.py's ragged loop consumes images in sentinel order)."""
    from matryoshka_mm_tpu.models.llava import prepare_multimodal_multi

    rng = np.random.default_rng(0)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9,
                     IMAGE_TOKEN_INDEX, 7, 11]], np.int32)
    px = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    numtoks, steps = 4, 6
    gen_cfg = GenerationConfig(max_new_tokens=steps, eos_token_id=-1)
    got = generate(params, cfg, ids, px,
                   matryoshka_vis_token_scale=f"ver=v0_numtoks={numtoks}",
                   gen_cfg=gen_cfg)[0]

    cur_ids = ids.copy()
    want = []
    for _ in range(steps):
        spliced, _ = prepare_multimodal_multi(
            params, cfg, jnp.asarray(cur_ids), jnp.asarray(px),
            numtoks=numtoks)
        logits = forward_spliced(params, cfg, spliced)
        last = int(np.asarray(spliced.lengths)[0]) - 1
        nxt = int(np.asarray(logits[0, last]).argmax())
        want.append(nxt)
        cur_ids = np.concatenate([cur_ids, [[nxt]]], axis=1)
    np.testing.assert_array_equal(got[:steps], want)

    # order sensitivity: swapping the two images must change the result
    got_swap = generate(params, cfg, ids, px[::-1].copy(),
                        matryoshka_vis_token_scale=f"ver=v0_numtoks={numtoks}",
                        gen_cfg=gen_cfg)[0]
    assert not np.array_equal(got[:steps], got_swap[:steps])


# ---------------------------------------------------------------------------
# beam search (reference surface: HF generate(num_beams=N) behind the eval
# scripts' --num-beams flag)
# ---------------------------------------------------------------------------

def _seq_logprob(params, cfg, ids, px, numtoks, toks):
    """Sum of log P(tok_i | prefix) under the model, recomputed naively."""
    import jax.nn as jnn

    total = 0.0
    cur = np.asarray(ids)
    for t in toks:
        spliced, _ = prepare_multimodal(
            params, cfg, jnp.asarray(cur), px, numtoks=numtoks,
            out_len=cur.shape[1] + numtoks + 16)
        logits = forward_spliced(params, cfg, spliced)
        last = int(np.asarray(spliced.lengths)[0]) - 1
        logp = jnn.log_softmax(logits[0, last].astype(jnp.float32))
        total += float(logp[int(t)])
        cur = np.concatenate([cur, [[int(t)]]], axis=1)
    return total


def test_beam_width_one_matches_greedy(params, cfg):
    from matryoshka_mm_tpu.generate import beam_generate

    rng = np.random.default_rng(1)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
    px = rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=6, eos_token_id=EOS)
    greedy = generate(params, cfg, ids, px,
                      matryoshka_vis_token_scale="ver=v0_numtoks=4",
                      gen_cfg=gen_cfg)[0]
    beam1 = beam_generate(params, cfg, ids, px,
                          matryoshka_vis_token_scale="ver=v0_numtoks=4",
                          num_beams=1, gen_cfg=gen_cfg)[0]
    assert list(beam1) == list(greedy)


def test_beam_search_score_not_worse_than_greedy(params, cfg):
    """The width-3 hypothesis's summed log-prob must be >= the greedy
    sequence's (on the same model) — the defining property of beam
    search.  Also: deterministic across calls."""
    from matryoshka_mm_tpu.generate import beam_generate

    rng = np.random.default_rng(2)
    ids = np.array([[7, IMAGE_TOKEN_INDEX, 11, 3]], np.int32)
    px = rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=5, eos_token_id=EOS)
    greedy = generate(params, cfg, ids, px,
                      matryoshka_vis_token_scale="ver=v0_numtoks=4",
                      gen_cfg=gen_cfg)[0]
    beam = beam_generate(params, cfg, ids, px,
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         num_beams=3, gen_cfg=gen_cfg)[0]
    beam2 = beam_generate(params, cfg, ids, px,
                          matryoshka_vis_token_scale="ver=v0_numtoks=4",
                          num_beams=3, gen_cfg=gen_cfg)[0]
    assert list(beam) == list(beam2)
    lp_beam = _seq_logprob(params, cfg, ids, px, 4, beam)
    lp_greedy = _seq_logprob(params, cfg, ids, px, 4, greedy)
    # normalized comparison only meaningful at equal lengths; compare raw
    # sums over the shorter prefix length when they differ
    n = min(len(beam), len(greedy))
    lp_beam_n = _seq_logprob(params, cfg, ids, px, 4, beam[:n])
    lp_greedy_n = _seq_logprob(params, cfg, ids, px, 4, greedy[:n])
    assert lp_beam_n >= lp_greedy_n - 1e-4, (lp_beam, lp_greedy)


def test_beam_search_text_only_and_facade(params, cfg):
    from matryoshka_mm_tpu.models.builder import LlavaModel

    ids = np.array([[5, 9, 12, 7]], np.int32)
    model = LlavaModel(params, cfg)
    out = model.generate(ids, num_beams=2, max_new_tokens=4,
                         eos_token_id=EOS)
    assert out.shape[0] == 1 and 1 <= out.shape[1] <= 4

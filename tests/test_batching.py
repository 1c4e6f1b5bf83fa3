import numpy as np
import jax
import pytest

from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
from matryoshka_mm_tpu.generate import GenerationConfig, generate
from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params


@pytest.fixture(scope="module")
def cfg():
    return LlavaConfig.tiny_debug()


@pytest.fixture(scope="module")
def params(cfg):
    return init_llava_params(jax.random.PRNGKey(0), cfg)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    return ids, px


def test_chunk_size_invariance(params, cfg):
    """Regression: decode positions must continue across chunk boundaries —
    chunk=1 and chunk=16 must produce identical greedy tokens."""
    ids, px = _inputs()
    outs = []
    for chunk in (1, 3, 16):
        out = generate(params, cfg, ids, px,
                       matryoshka_vis_token_scale="ver=v0_numtoks=4",
                       gen_cfg=GenerationConfig(max_new_tokens=12,
                                                decode_chunk=chunk,
                                                eos_token_id=-1))
        outs.append(out[0])
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_continuous_batcher_matches_generate(params, cfg):
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2,
                               eos_token_id=-1)
    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                max_new_tokens=16, gen_cfg=gen_cfg, chunk=2)
    try:
        ids1, px1 = _inputs(1)
        ids2, px2 = _inputs(2)
        r1 = batcher.submit(ids1, px1, numtoks=4, max_new_tokens=8)
        r2 = batcher.submit(ids2, px2, numtoks=4, max_new_tokens=8)
        toks1 = np.concatenate(list(batcher.stream(r1)))
        toks2 = np.concatenate(list(batcher.stream(r2)))

        want1 = generate(params, cfg, ids1, px1,
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         gen_cfg=gen_cfg)[0]
        want2 = generate(params, cfg, ids2, px2,
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         gen_cfg=gen_cfg)[0]
        np.testing.assert_array_equal(toks1[: len(want1)], want1)
        np.testing.assert_array_equal(toks2[: len(want2)], want2)
    finally:
        batcher.shutdown()


def test_paged_batcher_matches_generate(params, cfg):
    """backend="paged" must produce the same greedy streams as solo
    generation (pages + Pallas-or-gather attention vs dense cache)."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2,
                               eos_token_id=-1)
    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                                backend="paged", page_size=16)
    try:
        ids1, px1 = _inputs(1)
        ids2, px2 = _inputs(2)
        r1 = batcher.submit(ids1, px1, numtoks=4, max_new_tokens=8)
        r2 = batcher.submit(ids2, px2, numtoks=4, max_new_tokens=8)
        toks1 = np.concatenate(list(batcher.stream(r1)))
        toks2 = np.concatenate(list(batcher.stream(r2)))

        want1 = generate(params, cfg, ids1, px1,
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         gen_cfg=gen_cfg)[0]
        want2 = generate(params, cfg, ids2, px2,
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         gen_cfg=gen_cfg)[0]
        np.testing.assert_array_equal(toks1[: len(want1)], want1)
        np.testing.assert_array_equal(toks2[: len(want2)], want2)
        # all pages returned to the free list after both requests retire
        assert len(batcher.alloc.free) == batcher.max_batch * batcher.pages_per_row
    finally:
        batcher.shutdown()


def test_paged_batcher_page_extension(params, cfg):
    """A long decode must cross page boundaries (extend_row) and still
    match solo generation."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=24, decode_chunk=4,
                               eos_token_id=-1)
    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                max_new_tokens=40, gen_cfg=gen_cfg, chunk=4,
                                backend="paged", page_size=8)
    try:
        ids1, px1 = _inputs(5)
        r1 = batcher.submit(ids1, px1, numtoks=4, max_new_tokens=24)
        toks1 = np.concatenate(list(batcher.stream(r1)))
        want1 = generate(params, cfg, ids1, px1,
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         gen_cfg=gen_cfg)[0]
        np.testing.assert_array_equal(toks1[: len(want1)], want1)
        assert len(toks1) == 24
    finally:
        batcher.shutdown()


def test_batcher_late_joiner(params, cfg):
    """A request admitted mid-decode must still match solo generation."""
    import time

    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=10, decode_chunk=2,
                               eos_token_id=-1)
    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                max_new_tokens=32, gen_cfg=gen_cfg, chunk=2)
    try:
        ids1, px1 = _inputs(3)
        r1 = batcher.submit(ids1, px1, numtoks=4, max_new_tokens=10)
        time.sleep(1.0)  # let r1 decode a few chunks first
        ids2, px2 = _inputs(4)
        r2 = batcher.submit(ids2, px2, numtoks=4, max_new_tokens=10)
        toks2 = np.concatenate(list(batcher.stream(r2)))
        _ = np.concatenate(list(batcher.stream(r1)))

        want2 = generate(params, cfg, ids2, px2,
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         gen_cfg=gen_cfg)[0]
        np.testing.assert_array_equal(toks2[: len(want2)], want2)
    finally:
        batcher.shutdown()


def test_paged_batcher_stress(params, cfg):
    """Many mixed requests (text-only + image, varying budgets) through the
    paged prefix-cached pool: every stream terminates and matches solo
    generation."""
    import numpy as np

    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=12, decode_chunk=3,
                               eos_token_id=-1)
    b = ContinuousBatcher(params, cfg, max_batch=3, prefill_len=64,
                          max_new_tokens=24, gen_cfg=gen_cfg, chunk=3,
                          backend="paged", page_size=8, prefix_cache=True)
    rng = np.random.default_rng(0)
    reqs, specs = [], []
    try:
        for i in range(9):
            n_new = int(rng.integers(3, 12))
            if i % 3 == 2:          # text-only
                ids = rng.integers(5, 100, (1, int(rng.integers(4, 12)))
                                   ).astype(np.int32)
                px = None
            else:
                ids = rng.integers(5, 100, (1, int(rng.integers(5, 14)))
                                   ).astype(np.int32)
                ids[0, 1] = IMAGE_TOKEN_INDEX
                px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
            specs.append((ids, px, n_new))
            reqs.append(b.submit(ids, px, numtoks=4 if px is not None else None,
                                 max_new_tokens=n_new))
        outs = [np.concatenate(list(b.stream(r))) for r in reqs]
        for (ids, px, n_new), got in zip(specs, outs):
            g = GenerationConfig(max_new_tokens=n_new, decode_chunk=3,
                                 eos_token_id=-1)
            want = generate(params, cfg, ids, px,
                            matryoshka_vis_token_scale=(
                                "ver=v0_numtoks=4" if px is not None else None),
                            gen_cfg=g)[0]
            np.testing.assert_array_equal(got[: len(want)], want)
    finally:
        b.shutdown()


def test_batcher_scheduler_crash_fails_streams(params, cfg, monkeypatch):
    """A scheduler-thread exception must terminate every client stream
    (None sentinel) instead of hanging them, and later submits fail fast."""
    from matryoshka_mm_tpu.serve import batching as B

    batcher = B.ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                  max_new_tokens=16,
                                  gen_cfg=GenerationConfig(max_new_tokens=8,
                                                           eos_token_id=-1),
                                  chunk=2)

    def boom(*a, **k):
        raise RuntimeError("injected scheduler fault")

    batcher._admit = boom
    try:
        ids, px = _inputs(9)
        r = batcher.submit(ids, px, numtoks=4, max_new_tokens=8)
        chunks = list(batcher.stream(r))        # must terminate, not hang
        assert chunks == []
        assert isinstance(batcher.error, RuntimeError)
        r2 = batcher.submit(ids, px, numtoks=4, max_new_tokens=8)
        assert list(batcher.stream(r2)) == []   # fail-fast after death
    finally:
        batcher.shutdown()

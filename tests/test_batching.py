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


def test_submit_rejects_overlong_prompt(params, cfg):
    """A prompt longer than the pool prefill region must fail just that
    request (ValueError in submit) instead of crashing the scheduler
    thread with a negative left-pad (ADVICE r1)."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                max_new_tokens=16,
                                gen_cfg=GenerationConfig(max_new_tokens=8,
                                                         eos_token_id=-1))
    try:
        long_ids = np.arange(5, 5 + batcher.L + 10, dtype=np.int32)[None]
        with pytest.raises(ValueError, match="exceeds the pool prefill"):
            batcher.submit(long_ids, None, max_new_tokens=8)
        # spliced image prompt that exceeds L is also rejected: the image
        # token expands to `numtoks` features, so account for the splice
        ids = np.full((1, 4), 7, np.int32)
        ids[0, 1] = IMAGE_TOKEN_INDEX
        px = np.zeros((1, 3, 56, 56), np.float32)
        assert batcher.spliced_len(ids, batcher.L) == 3 + batcher.L
        with pytest.raises(ValueError, match="exceeds the pool prefill"):
            batcher.submit(ids, px, numtoks=batcher.L, max_new_tokens=8)
        # a fitting request still works after the rejections
        ids2, px2 = _inputs(11)
        r = batcher.submit(ids2, px2, numtoks=4, max_new_tokens=4)
        out = np.concatenate(list(batcher.stream(r)))
        assert out.size == 4
        assert batcher.error is None
    finally:
        batcher.shutdown()


def test_submit_rejects_multi_image_prompt(params, cfg):
    """A (n, 3, H, W) stack with several <image> tokens is multi-image,
    not anyres tiles — the pool must reject it (ADVICE r2: the anyres
    prefill would merge the images as one tile grid and admission/splice
    would disagree on token counts)."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                max_new_tokens=16,
                                gen_cfg=GenerationConfig(max_new_tokens=8,
                                                         eos_token_id=-1))
    try:
        ids = np.full((1, 6), 7, np.int32)
        ids[0, 1] = IMAGE_TOKEN_INDEX
        ids[0, 3] = IMAGE_TOKEN_INDEX
        px = np.zeros((2, 3, 56, 56), np.float32)
        with pytest.raises(ValueError, match="multi-image"):
            batcher.submit(ids, px, numtoks=4, max_new_tokens=8)
        # pool still healthy afterwards
        ids2, px2 = _inputs(13)
        r = batcher.submit(ids2, px2, numtoks=4, max_new_tokens=4)
        out = np.concatenate(list(batcher.stream(r)))
        assert out.size == 4
        assert batcher.error is None
    finally:
        batcher.shutdown()


def test_dense_pool_reset_continues_streams(params, cfg):
    """When the dense pool's write region is exhausted mid-request, the
    request must be re-admitted (prompt + generated so far) and the client
    stream must continue seamlessly — full greedy output matches solo
    generation (ADVICE r1: no silent truncation)."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=40, decode_chunk=2,
                               eos_token_id=-1)
    # pool decode region of 12 tokens forces >=2 resets for a 40-token req
    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                max_new_tokens=12, gen_cfg=gen_cfg, chunk=2)
    try:
        ids, px = _inputs(6)
        r = batcher.submit(ids, px, numtoks=4, max_new_tokens=40)
        toks = np.concatenate(list(batcher.stream(r)))
        want = generate(params, cfg, ids, px,
                        matryoshka_vis_token_scale="ver=v0_numtoks=4",
                        gen_cfg=gen_cfg)[0]
        assert toks.size == 40
        np.testing.assert_array_equal(toks[: len(want)], want)
    finally:
        batcher.shutdown()


def test_refcount_allocator_stale_shared_page():
    """allocate_row with a stale shared page that sits on the free list
    must take it off the free list (never hand it out twice)."""
    from matryoshka_mm_tpu.serve.prefix_cache import RefcountAllocator

    a = RefcountAllocator(n_pages=8, page_size=4, max_rows=2,
                          max_pages_per_row=4)
    assert a.allocate_row(0, 8)           # 2 pages
    shared = [int(a.tables[0, 0])]
    a.pin(shared)
    a.free_row(0)                          # pinned page -> cached
    flushed = a.flush_cached()             # cached -> free (stale-hit setup)
    assert shared[0] in flushed and shared[0] in a.free
    # re-use the stale page as shared: must leave exactly one owner
    assert a.allocate_row(1, 8, shared=shared)
    assert shared[0] not in a.free
    assert a.ref[shared[0]] == 1
    # and allocating the rest of the pool never returns that page again
    assert a.allocate_row(0, 8)
    assert int(a.tables[0, 0]) != shared[0]
    assert int(a.tables[0, 1]) != shared[0]


def test_batcher_finishes_on_budget_one(params, cfg):
    """max_new_tokens=1 must emit exactly one token (no over-emission past
    the budget through an activated row)."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                max_new_tokens=16,
                                gen_cfg=GenerationConfig(max_new_tokens=8,
                                                         eos_token_id=-1))
    try:
        ids, px = _inputs(12)
        r = batcher.submit(ids, px, numtoks=4, max_new_tokens=1)
        toks = np.concatenate(list(batcher.stream(r)))
        assert toks.size == 1
        want = generate(params, cfg, ids, px,
                        matryoshka_vis_token_scale="ver=v0_numtoks=4",
                        gen_cfg=GenerationConfig(max_new_tokens=1,
                                                 eos_token_id=-1))[0]
        np.testing.assert_array_equal(toks, want[:1])
    finally:
        batcher.shutdown()


def _anyres_cfg():
    from matryoshka_mm_tpu.models.clip import ClipVisionConfig
    from matryoshka_mm_tpu.models.llama import LlamaConfig
    from matryoshka_mm_tpu.models.llava import M3Preset

    return LlavaConfig(
        llama=LlamaConfig.tiny_debug(),
        vision=ClipVisionConfig.tiny_debug(),
        preset=M3Preset(matryoshka_vis_token_scale="ver=v0_numtoks=[1,4,16]"),
        mm_patch_merge_type="spatial_unpad",
        image_aspect_ratio="anyres",
        image_grid_pinpoints="[(112, 56), (56, 112), (112, 112)]",
        tokenizer_model_max_length=256,
    )


def test_anyres_through_batched_pool():
    """anyres multi-tile requests are admitted into the shared pool (not
    routed around it) and match the solo anyres generate."""
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig, generate
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = _anyres_cfg()
    params = init_llava_params(jax.random.PRNGKey(3), cfg)
    gen_cfg = GenerationConfig(max_new_tokens=6, decode_chunk=2,
                               eos_token_id=-1)
    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=128,
                                max_new_tokens=16, gen_cfg=gen_cfg, chunk=2)
    try:
        ids = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42]], np.int32)
        px = np.random.default_rng(4).standard_normal(
            (5, 3, 56, 56)).astype(np.float32)
        req = batcher.submit(ids, px, numtoks=16, max_new_tokens=6,
                             image_size=(500, 500))
        toks = np.concatenate(list(batcher.stream(req)))
        want = generate(params, cfg, ids, px[None], image_sizes=[(500, 500)],
                        matryoshka_vis_token_scale="ver=v0_numtoks=16",
                        gen_cfg=gen_cfg)[0]
        np.testing.assert_array_equal(toks[: len(want)], want)
        # fits() accounts for the merged anyres token count (88), not 16
        assert batcher.spliced_len(ids, 16, px, (500, 500)) == 3 + 88
    finally:
        batcher.shutdown()


def test_anyres_prefix_cache_hit():
    """A repeated anyres request reuses cached prefix pages."""
    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = _anyres_cfg()
    params = init_llava_params(jax.random.PRNGKey(3), cfg)
    gen_cfg = GenerationConfig(max_new_tokens=4, decode_chunk=2,
                               eos_token_id=-1)
    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=192,
                                max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                                backend="paged", page_size=16,
                                prefix_cache=True)
    try:
        # enough trailing text that full pages cover the image region
        # (spliced: 20 text + 88 anyres + 30 text = 138; image region ends
        # at 108 <= 8 full 16-token pages)
        ids = np.array([[7] * 20 + [IMAGE_TOKEN_INDEX] + [9] * 30], np.int32)
        px = np.random.default_rng(4).standard_normal(
            (5, 3, 56, 56)).astype(np.float32)
        r1 = batcher.submit(ids, px, numtoks=16, max_new_tokens=4,
                            image_size=(500, 500))
        t1 = np.concatenate(list(batcher.stream(r1)))
        assert batcher.stats["prefix_hits"] == 0
        r2 = batcher.submit(ids, px, numtoks=16, max_new_tokens=4,
                            image_size=(500, 500))
        t2 = np.concatenate(list(batcher.stream(r2)))
        assert batcher.stats["prefix_hits"] == 1
        assert batcher.stats["prefix_pages_reused"] > 0
        np.testing.assert_array_equal(t1[: len(t2)], t2[: len(t1)])
    finally:
        batcher.shutdown()


def test_mpt_paged_batcher_matches_generate():
    """MPT (alibi) decodes through the paged backend via the gather
    attention path — previously rejected with a ValueError."""
    import dataclasses

    from matryoshka_mm_tpu.models.llama import LlamaConfig
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    cfg = LlavaConfig.tiny_debug()
    cfg = dataclasses.replace(cfg, llama=LlamaConfig.tiny_debug(arch="mpt"))
    params = init_llava_params(jax.random.PRNGKey(5), cfg)
    gen_cfg = GenerationConfig(max_new_tokens=6, decode_chunk=2,
                               eos_token_id=-1)
    batcher = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                                max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                                backend="paged", page_size=16)
    try:
        assert batcher.use_kernel is False  # alibi: gather path
        ids, px = _inputs(6)
        req = batcher.submit(ids, px, numtoks=4, max_new_tokens=6)
        toks = np.concatenate(list(batcher.stream(req)))
        want = generate(params, cfg, ids, px,
                        matryoshka_vis_token_scale="ver=v0_numtoks=4",
                        gen_cfg=gen_cfg)[0]
        np.testing.assert_array_equal(toks[: len(want)], want)
    finally:
        batcher.shutdown()


def test_paged_batcher_with_int4_fused_params():
    """load_4bit params (fused qkv/gateup int4 leaves) must decode through
    the paged backend — the hand-written decode body needs the fused-leaf
    and layer-index paths, not just llama_forward."""
    from matryoshka_mm_tpu.models.builder import load_pretrained_model
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    tok, model, proc, ctx = load_pretrained_model(
        "debug://tiny", None, "tiny", load_4bit=True)
    assert "qkv_proj" in model.params["llama"]["layers"]["self_attn"]
    gen_cfg = GenerationConfig(max_new_tokens=6, decode_chunk=2,
                               eos_token_id=-1)
    batcher = ContinuousBatcher(model.params, model.cfg, max_batch=2,
                                prefill_len=64, max_new_tokens=16,
                                gen_cfg=gen_cfg, chunk=2,
                                backend="paged", page_size=16)
    try:
        ids, px = _inputs(9)
        req = batcher.submit(ids, px, numtoks=4, max_new_tokens=6)
        toks = np.concatenate(list(batcher.stream(req)))
        want = generate(model.params, model.cfg, ids, px,
                        matryoshka_vis_token_scale="ver=v0_numtoks=4",
                        gen_cfg=gen_cfg)[0]
        np.testing.assert_array_equal(toks[: len(want)], want)
    finally:
        batcher.shutdown()


def _paused_batcher(monkeypatch, params, cfg, **kw):
    """Build a ContinuousBatcher whose scheduler thread hasn't started, so
    submissions pile up in pending and the first admission round sees them
    all at once (deterministic batched-admission grouping)."""
    import threading

    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    orig_start = threading.Thread.start
    monkeypatch.setattr(threading.Thread, "start", lambda self: None)
    try:
        batcher = ContinuousBatcher(params, cfg, **kw)
    finally:
        monkeypatch.undo()
    return batcher, orig_start


def test_batched_admission_group_matches_generate(params, cfg, monkeypatch):
    """A burst of compatible arrivals must admit through ONE batched group
    prefill (admit_stats) and still match solo greedy generation exactly —
    including rows with different raw prompt lengths (mask path)."""
    gen_cfg = GenerationConfig(max_new_tokens=6, decode_chunk=2,
                               eos_token_id=-1)
    batcher, start = _paused_batcher(
        monkeypatch, params, cfg, max_batch=4, prefill_len=64,
        max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
        backend="paged", page_size=16)
    try:
        rng = np.random.default_rng(7)
        reqs, wants = [], []
        for i in range(4):
            ids = np.array([[5 + i, 17, IMAGE_TOKEN_INDEX, 42, 9, 3][: 4 + (i % 3)]],
                           np.int32)
            px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
            reqs.append(batcher.submit(ids, px, numtoks=4, max_new_tokens=6))
            wants.append(generate(params, cfg, ids, px,
                                  matryoshka_vis_token_scale="ver=v0_numtoks=4",
                                  gen_cfg=gen_cfg)[0])
        start(batcher._thread)      # all 4 pending -> one group of 4
        for req, want in zip(reqs, wants):
            toks = np.concatenate(list(batcher.stream(req)))
            np.testing.assert_array_equal(toks[: len(want)], want)
        assert batcher.admit_stats["grouped"] == 4
        assert batcher.admit_stats["solo"] == 0
    finally:
        batcher.shutdown()


def test_batched_admission_mixed_burst(params, cfg, monkeypatch):
    """Image and text-only arrivals group separately; odd group sizes split
    into power-of-two chunks + solo remainder."""
    gen_cfg = GenerationConfig(max_new_tokens=5, decode_chunk=2,
                               eos_token_id=-1)
    batcher, start = _paused_batcher(
        monkeypatch, params, cfg, max_batch=4, prefill_len=64,
        max_new_tokens=16, gen_cfg=gen_cfg, chunk=2)
    try:
        rng = np.random.default_rng(8)
        reqs, wants = [], []
        for i in range(3):          # 3 image requests -> group 2 + solo 1
            ids = np.array([[5 + i, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
            px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
            reqs.append(batcher.submit(ids, px, numtoks=4, max_new_tokens=5))
            wants.append(generate(params, cfg, ids, px,
                                  matryoshka_vis_token_scale="ver=v0_numtoks=4",
                                  gen_cfg=gen_cfg)[0])
        ids_t = np.array([[11, 12, 13, 14]], np.int32)
        reqs.append(batcher.submit(ids_t, None, max_new_tokens=5))
        wants.append(generate(params, cfg, ids_t, None,
                              gen_cfg=gen_cfg)[0])
        start(batcher._thread)
        for req, want in zip(reqs, wants):
            toks = np.concatenate(list(batcher.stream(req)))
            np.testing.assert_array_equal(toks[: len(want)], want)
        assert batcher.admit_stats["grouped"] == 2
        assert batcher.admit_stats["solo"] == 2
    finally:
        batcher.shutdown()


def test_paged_pool_pressure_retries_front_of_line(params, cfg):
    """Out-of-pages admissions requeue at the FRONT of the line (not the
    pending tail, where later arrivals could starve them): under a pool
    where rows must wait for pages, every submitted request still
    completes at full length, and the retry path is actually exercised."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2,
                               eos_token_id=-1)
    # 39-token prompt + 4 vis tokens spliced = 42 -> 3 pages on admission
    # (headroom 3), growing to 4 by the end of an 8-token generation; a
    # 4-allocatable-page pool (5 incl. the reserved trash page) admits
    # ONE row at a time and forces the others through the out-of-pages
    # retry path while leaving room to finish.
    base = np.array([[5, 17, IMAGE_TOKEN_INDEX, 42, 9]], np.int32)
    filler = np.arange(10, 44, dtype=np.int32)[None, :]
    batcher = ContinuousBatcher(params, cfg, max_batch=3, prefill_len=64,
                                max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                                backend="paged", page_size=16,
                                prefix_cache=True, n_pages=5)
    try:
        reqs, wants = [], []
        for i in range(3):
            rng = np.random.default_rng(i)
            ids = np.concatenate([base, filler + i], axis=1)
            px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
            reqs.append(batcher.submit(ids, px, numtoks=4,
                                       max_new_tokens=8))
            wants.append(generate(
                params, cfg, ids, px,
                matryoshka_vis_token_scale="ver=v0_numtoks=4",
                gen_cfg=gen_cfg)[0])
        for r, want in zip(reqs, wants):
            toks = np.concatenate(list(batcher.stream(r)))
            np.testing.assert_array_equal(toks[: len(want)], want)
            assert len(toks) == len(want)
        assert batcher.stats["admit_retries"] >= 1
        assert batcher._retry == []
    finally:
        batcher.shutdown()


def test_stream_keeps_tokens_equal_to_pad_id(params, cfg):
    """The emitted stream must not drop genuinely generated tokens whose
    id equals pad_token_id (regression: the host filtered the chunk by
    value, so a real pad-id token vanished from the stream while the
    device advanced over it — desyncing prompt-lookup drafts and
    dense-reset re-prompts from the device cache).  The device now marks
    empty lanes with -1 (out-of-band), so the stream is invariant to
    which vocab id serves as pad."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    ids, px = _inputs(3)
    streams = {}
    for name, pad in (("pad0", 0), ("pad_real", None)):
        gen_cfg = GenerationConfig(max_new_tokens=8, decode_chunk=2,
                                   eos_token_id=-1, pad_token_id=pad or 0)
        if pad is None:
            # second pass: make pad_token_id a token the model actually
            # emits, so any by-value filtering would corrupt the stream
            gen_cfg = GenerationConfig(
                max_new_tokens=8, decode_chunk=2, eos_token_id=-1,
                pad_token_id=int(streams["pad0"][0]))
        b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                              max_new_tokens=16, gen_cfg=gen_cfg, chunk=2)
        try:
            req = b.submit(ids, px, numtoks=4, max_new_tokens=8)
            streams[name] = np.concatenate(list(b.stream(req)))
        finally:
            b.shutdown()
    assert streams["pad0"].shape[0] == 8
    np.testing.assert_array_equal(streams["pad0"], streams["pad_real"])


def test_paged_batcher_sliding_window_matches_generate():
    """A mistral-style sliding_window config served through the paged
    backend must window its attention (regression: the gather path
    dropped cfg.sliding_window and the paged kernels don't implement
    windowing, so rows longer than the window silently attended to
    expired tokens and diverged from the dense/solo path)."""
    import dataclasses

    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    base = LlavaConfig.tiny_debug()
    cfg_w = dataclasses.replace(
        base, llama=dataclasses.replace(base.llama, arch="mistral",
                                        sliding_window=6))
    params_w = init_llava_params(jax.random.PRNGKey(0), cfg_w)
    ids, px = _inputs(5)
    # prompt (5 text + 4 visual tokens) + 12 decoded tokens sails well
    # past the 6-token window, so windowing decides the logits
    gen_cfg = GenerationConfig(max_new_tokens=12, decode_chunk=3,
                               eos_token_id=-1)
    want = generate(params_w, cfg_w, ids, px,
                    matryoshka_vis_token_scale="ver=v0_numtoks=4",
                    gen_cfg=gen_cfg)[0]
    b = ContinuousBatcher(params_w, cfg_w, max_batch=2, prefill_len=64,
                          max_new_tokens=16, gen_cfg=gen_cfg, chunk=3,
                          backend="paged", page_size=16)
    try:
        req = b.submit(ids, px, numtoks=4, max_new_tokens=12)
        got = np.concatenate(list(b.stream(req)))
    finally:
        b.shutdown()
    np.testing.assert_array_equal(got[: len(want)], want)


def test_out_of_pages_mid_decode_is_loud(params, cfg):
    """A row that outgrows a pool too small to ever re-admit it must end
    with an explicit BatchError — never a clean end-of-stream that makes
    a truncation look like a normal finish (regression: _ensure_pages
    put None and the client saw 5-of-8 tokens as success)."""
    from matryoshka_mm_tpu.serve.batching import BatchError, ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=48, decode_chunk=2,
                               eos_token_id=-1)
    ids, px = _inputs(0)   # 5 text + 4 visual = 9 spliced tokens
    # 4-page pool = 3 allocatable: admission takes 1 page (9 + headroom),
    # growth needs a 4th page the pool can never provide, and the
    # continuation (prompt+generated) can't re-admit either
    b = ContinuousBatcher(params, cfg, max_batch=1, prefill_len=64,
                          max_new_tokens=48, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=16, n_pages=4)
    try:
        req = b.submit(ids, px, numtoks=4, max_new_tokens=48)
        toks = []
        with pytest.raises(BatchError, match="pages"):
            for chunk in b.stream(req):
                toks.append(chunk)
        # the tokens streamed before the abort are still valid output
        assert sum(t.size for t in toks) > 0
    finally:
        b.shutdown()


def test_pipelined_rounds_match_serial(params, cfg):
    """The software-pipelined decode loop (dispatch round k+1 before
    fetching round k) must be invisible to clients: identical greedy
    streams to the serial loop under staggered admissions (late joiner
    lands while a round is in flight), with all pages freed at drain."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=10, decode_chunk=2,
                               eos_token_id=-1)
    streams = {}
    for pipelined in (False, True):
        b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                              max_new_tokens=16, gen_cfg=gen_cfg, chunk=2,
                              backend="paged", page_size=16,
                              pipeline_rounds=pipelined)
        try:
            ids1, px1 = _inputs(1)
            ids2, px2 = _inputs(2)
            ids3, px3 = _inputs(3)
            r1 = b.submit(ids1, px1, numtoks=4, max_new_tokens=10)
            r2 = b.submit(ids2, px2, numtoks=4, max_new_tokens=6)
            # r3 joins once r2's slot frees — mid-stream, rounds in flight
            toks2 = np.concatenate(list(b.stream(r2)))
            r3 = b.submit(ids3, px3, numtoks=4, max_new_tokens=8)
            toks1 = np.concatenate(list(b.stream(r1)))
            toks3 = np.concatenate(list(b.stream(r3)))
            streams[pipelined] = (toks1, toks2, toks3)
            assert len(b.alloc.free) == b.max_batch * b.pages_per_row
        finally:
            b.shutdown()
    for a, s in zip(streams[True], streams[False]):
        np.testing.assert_array_equal(a, s)


def test_pipelined_cancel_mid_flight(params, cfg):
    """Cancelling a request while a pipelined round is in flight retires
    the row exactly once and the other stream is unaffected."""
    from matryoshka_mm_tpu.serve.batching import ContinuousBatcher

    gen_cfg = GenerationConfig(max_new_tokens=64, decode_chunk=2,
                               eos_token_id=-1)
    b = ContinuousBatcher(params, cfg, max_batch=2, prefill_len=64,
                          max_new_tokens=64, gen_cfg=gen_cfg, chunk=2,
                          backend="paged", page_size=16)
    try:
        ids1, px1 = _inputs(1)
        ids2, px2 = _inputs(2)
        r1 = b.submit(ids1, px1, numtoks=4, max_new_tokens=64)
        r2 = b.submit(ids2, px2, numtoks=4, max_new_tokens=12)
        got1 = []
        for chunk in b.stream(r1):
            got1.append(chunk)
            if sum(t.size for t in got1) >= 4:
                b.cancel(r1)
                break
        # drain whatever the scheduler still emits post-cancel
        for _ in b.stream(r1):
            pass
        toks2 = np.concatenate(list(b.stream(r2)))
        want2 = generate(params, cfg, ids2, px2,
                         matryoshka_vis_token_scale="ver=v0_numtoks=4",
                         gen_cfg=gen_cfg)[0]
        np.testing.assert_array_equal(toks2[:12], want2[:12])
        assert len(b.alloc.free) == b.max_batch * b.pages_per_row
    finally:
        b.shutdown()

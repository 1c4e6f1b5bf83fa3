"""Continuous batching for the serving worker.

The reference worker runs one torch generation thread per request behind an
asyncio semaphore (reference: llava/serve/model_worker.py:240-268) — K
concurrent requests mean K independent decode loops.  On TPU a single
batched decode is far cheaper than K sequential ones, so this module keeps
ONE batched KV-cache pool and continuously admits/retires requests between
decode chunks (SURVEY.md §7 step 9):

* the pool is a fixed (max_batch, capacity) KV cache; every request is
  left-padded into the same prefill region so all rows share write slots;
* new requests prefill into pool rows: compatible burst arrivals share ONE
  batched (G, L) prefill (weights read once for the whole group, see
  _admit_group), the rest use the batch=1 prefill; cache rows are inserted
  into the pool with ``dynamic_update_slice``;
* one jitted decode-chunk advances all active rows; finished rows free
  their slot and late joiners reuse it (validity masks keep causality
  exact regardless of join time);
* per-request token streams come out of thread-safe queues.

``backend="paged"`` swaps the fixed pool for the paged KV cache
(serve/paged_cache.py): each row maps its tokens onto free-list pages, so
capacity is per-row instead of pool-lifetime — finished rows return their
pages immediately and there is no pool-wide reset when write_idx runs out.
On TPU the paged path attends through the Pallas paged-attention kernel.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from functools import lru_cache, partial
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..generate import GenerationConfig, _prefill_fn, _round_up, _select_token
from ..models.llama import KVCache, embed_tokens, init_kv_cache, llama_forward, lm_head
from ..models.llava import LlavaConfig


class BatchError(RuntimeError):
    """Raised out of ``stream()`` when the pool had to abort the request
    (e.g. capacity exhaustion that re-admission could not absorb)."""

    def __init__(self, message: str, code: int = 2):
        super().__init__(message)
        self.code = code


@dataclass
class _StreamError:
    message: str
    code: int = 2


@dataclass
class _Request:
    rid: int
    input_ids: np.ndarray
    pixel_values: Optional[np.ndarray]
    numtoks: Optional[int]
    max_new_tokens: int
    lora_id: Optional[str] = None
    # anyres multi-tile request: pixel_values (T_tiles, 3, H, W) and the
    # original (w, h) the unpad merge needs
    image_size: Optional[tuple] = None
    out_queue: "queue.Queue" = field(default_factory=queue.Queue)
    emitted: int = 0
    slot: int = -1
    # tokens streamed so far; lets a pool reset re-admit the request with
    # prompt+generated instead of silently truncating the stream
    generated: List[int] = field(default_factory=list)
    # regex the output must full-match (serve/constrained.py); admits solo
    constraint: Optional[str] = None
    # (trans_local, offset, start_local) installed at admission
    fsm: Optional[tuple] = None
    # continuation of an out-of-pages requeue: resume the constraint DFA
    # at this local state instead of dfa.start (the prompt now embeds the
    # tokens already matched)
    fsm_resume: Optional[int] = None
    # client-side early stop (stop string hit / disconnect): the
    # scheduler retires the row at its next round instead of decoding the
    # remaining budget into a stream nobody reads
    cancelled: bool = False
    # host copy of the row length right after prefill (== the spliced
    # prompt length, computed host-side — no device fetch): lets the
    # pipelined decode loop compute page needs without fetching device
    # lengths (row_len == len0 + len(generated) - 1 for every processed
    # round)
    len0: int = 0
    # deferred-admission marker: the prefill's first token is still a
    # device future (not yet in ``generated``/the client stream); the
    # scheduler resolves it after the next round dispatch — see
    # _activate_rows/_resolve_pending
    pending: bool = False


@lru_cache(maxsize=8)
def _pool_decode_fn(cfg: LlavaConfig, gen_cfg: GenerationConfig, steps: int):
    # donate the pool cache: updated in place across chunks (the caller
    # always replaces self.pool; on error the batcher dies, so the
    # invalidated buffer is never touched again)
    @partial(jax.jit, donate_argnums=(1,))
    def decode(llama_params, cache: KVCache, tokens, lengths, active, budget,
               rng):
        """Advance all pool rows `steps` tokens; inactive rows are masked."""

        def step(carry, _):
            cache, token, lengths, budget, active, rng = carry
            embeds = embed_tokens(llama_params, token[:, None])
            pos = lengths[:, None]
            hidden, cache = llama_forward(
                llama_params, cfg.llama, embeds, position_ids=pos,
                attn_valid=active[:, None], cache=cache)
            logits = lm_head(llama_params, hidden[:, 0:1, :])[:, 0]
            nxt, rng2 = _select_token(logits, gen_cfg, rng)
            # stream value: -1 marks "no token" for rows inactive this
            # step — out-of-band, so a genuinely sampled pad_token_id
            # (id 0 = <unk> for llama) still reaches the client and the
            # host history stays in sync with the device cache
            emit = jnp.where(active, nxt, -1)
            nxt = jnp.where(active, nxt, gen_cfg.pad_token_id)
            budget = jnp.where(active, budget - 1, budget)
            active = active & (nxt != gen_cfg.eos_token_id) & (budget > 0)
            return (cache, nxt, lengths + 1, budget, active, rng2), emit

        (cache, token, lengths, budget, active, rng), toks = jax.lax.scan(
            step, (cache, tokens, lengths, budget, active, rng),
            jnp.arange(steps))
        return cache, token, lengths, budget, active, toks.T

    return decode


class ContinuousBatcher:
    """Single-model continuous batcher; thread-safe submit/stream API."""

    def __init__(self, params, cfg: LlavaConfig, max_batch: int = 4,
                 prefill_len: int = 1024, max_new_tokens: int = 512,
                 gen_cfg: Optional[GenerationConfig] = None,
                 chunk: int = 8, backend: str = "dense",
                 page_size: int = 64, use_kernel: Optional[bool] = None,
                 prefix_cache: bool = False, adapters: Optional[dict] = None,
                 speculative_k: int = 0, spec_ngram: int = 3,
                 fsm_vocab: Optional[list] = None, max_fsm_states: int = 64,
                 n_pages: Optional[int] = None, pipeline_rounds: bool = True):
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        # escape hatch (and A/B lever) for the software-pipelined decode
        # loop; only the paged non-speculative scheduler pipelines
        self.pipeline_rounds = pipeline_rounds
        self.L = _round_up(prefill_len, 64)
        self.capacity = self.L + max_new_tokens
        self.gen_cfg = gen_cfg or GenerationConfig(decode_chunk=chunk)
        self.chunk = chunk
        self.backend = backend
        self.spec_k = int(speculative_k)
        self.spec_ngram = int(spec_ngram)
        if self.spec_k > 0:
            # batched prompt-lookup speculative decoding: host proposes k
            # drafts per row from each request's prompt+generated history,
            # one Sq=k+1 paged verify accepts the greedy-consistent prefix
            if backend != "paged":
                raise ValueError("speculative_k requires the paged backend")
            if self.gen_cfg.do_sample or self.gen_cfg.temperature > 0:
                raise ValueError(
                    "speculative decoding is greedy-only: draft acceptance "
                    "compares against argmax (set temperature=0/do_sample="
                    "False, the reference eval protocol)")
        self.spec_stats = {"verify_steps": 0, "tokens_emitted": 0}
        # page headroom per decode dispatch: a vanilla chunk advances a row
        # by `chunk` slots, a speculative verify writes k+1 slots up front
        self._headroom = max(self.chunk, self.spec_k + 1) + 1

        # constrained decoding (serve/constrained.py): per-slot DFA spans
        # in one dense (2 + max_batch*quota, V) table pool; row 0 is the
        # dead state (eos only), row 1 the unconstrained free state
        self.fsm_vocab = fsm_vocab
        self.fsm_quota = int(max_fsm_states)
        self._fsm_cache: "OrderedDict[str, tuple]" = OrderedDict()
        if fsm_vocab is not None:
            if backend != "paged":
                raise ValueError("constrained decoding (fsm_vocab) requires "
                                 "the paged backend")
            if self.spec_k:
                raise ValueError("constrained decoding and speculative_k "
                                 "cannot combine: the verify step does not "
                                 "mask draft logits")
            # the allow mask must broadcast against the model's logits:
            # pad short vocabs (lm_head wider than the tokenizer, e.g.
            # padded embeddings) with never-matchable sentinels; a vocab
            # WIDER than the logits means the wrong tokenizer — reject
            V_model = cfg.llama.vocab_size
            if len(fsm_vocab) > V_model:
                raise ValueError(
                    f"fsm_vocab has {len(fsm_vocab)} entries but the model "
                    f"emits {V_model} logits — wrong tokenizer?")
            self._fsm_pad_ids = list(range(len(fsm_vocab), V_model))
            fsm_vocab = self.fsm_vocab = (
                list(fsm_vocab) + [""] * len(self._fsm_pad_ids))
            V = len(fsm_vocab)
            n_rows = 2 + max_batch * self.fsm_quota
            allow = np.zeros((n_rows, V), bool)
            allow[0, self.gen_cfg.eos_token_id] = True   # dead: eos only
            allow[1, :] = True                            # free: anything
            trans = np.zeros((n_rows, V), np.int32)
            trans[1, :] = 1
            self.fsm_allow = jnp.asarray(allow)
            self.fsm_trans = jnp.asarray(trans)
            self.fsm_state = jnp.ones((max_batch,), jnp.int32)
        if backend == "paged":
            from .paged_cache import PageAllocator, init_paged_cache

            if cfg.llama.arch not in ("llama", "mistral", "mpt"):
                raise ValueError(
                    f"paged KV backend supports llama/mistral/mpt decoders, "
                    f"not arch={cfg.llama.arch!r}; use backend='dense'")

            self.page_size = page_size
            # prefill caches must cover a whole number of pages (import
            # carves n_p full pages out of the compacted cache).  Rows get
            # one dispatch's headroom of extra page room on top of
            # L + max_new so _ensure_pages never kills a row that still
            # has budget (a speculative verify advances up to k+1 slots)
            self.capacity = _round_up(self.capacity + self._headroom,
                                      page_size)
            self.pages_per_row = -(-self.capacity // page_size)
            # n_pages override: bound the paged pool's HBM footprint below
            # the worst case (every row at full capacity); admissions that
            # cannot get pages retry at the front of the line
            if n_pages is None:
                # +1: page 0 is the allocator's reserved trash page
                # (paged_cache.PageAllocator), not allocatable capacity
                n_pages = max_batch * self.pages_per_row + 1
            # dtype=None: init_paged_cache honors cfg.llama.kv_cache_dtype
            # (int8 pools carry per-slot dequant scales through the pytree)
            self.paged = init_paged_cache(cfg.llama, n_pages, page_size)
            if prefix_cache:
                from .prefix_cache import PrefixIndex, RefcountAllocator

                self.alloc = RefcountAllocator(n_pages, page_size, max_batch,
                                               self.pages_per_row)
                self.index = PrefixIndex()
                self.stats = {"prefix_hits": 0, "prefix_misses": 0,
                              "prefix_pages_reused": 0, "admit_retries": 0}
            else:
                self.alloc = PageAllocator(n_pages, page_size, max_batch,
                                           self.pages_per_row)
                self.index = None
            self.tables = jnp.asarray(self.alloc.tables)
            # the Pallas paged-decode kernel bakes in RoPE; MPT (alibi)
            # attends through the gather path inside the same decode body.
            # Mosaic also can't slice the lane (last) dim, so head_dim must
            # fill whole 128-lane registers — tiny debug configs (Dh=16)
            # take the gather path even on real TPU.
            head_dim = cfg.llama.hidden_size // cfg.llama.num_attention_heads
            self.use_kernel = (cfg.llama.arch != "mpt"
                               and head_dim % 128 == 0
                               and (jax.default_backend() == "tpu"
                                    if use_kernel is None
                                    else bool(use_kernel)))
        else:
            # dtype=None: init_kv_cache honors cfg.llama.kv_cache_dtype
            # (int8 pools carry scale buffers through the same pytree)
            self.pool = init_kv_cache(cfg.llama, max_batch, self.capacity)
            self.index = None
        self.tokens = jnp.zeros((max_batch,), jnp.int32)
        self.lengths = jnp.zeros((max_batch,), jnp.int32)
        self.active = jnp.zeros((max_batch,), bool)
        self.budget = jnp.zeros((max_batch,), jnp.int32)

        # multi-LoRA serving (serve/multi_lora.py): per-row adapter index
        self.lora_pack = None
        self.lora_names = {None: 0}
        self.lora_idx = None
        self._adapter_trees = adapters or {}
        self._wrapped_cache = {}
        if adapters:
            if backend != "paged":
                raise ValueError("multi-LoRA serving requires the paged "
                                 "backend")
            layers = params.get("llama", {}).get("layers", {})
            if "qkv_proj" in layers.get("self_attn", {}):
                raise ValueError(
                    "multi-LoRA serving cannot target fused qkv leaves; "
                    "quantize the base with fuse=False (the worker does "
                    "this automatically when --lora-adapters is set)")
            from .multi_lora import pack_adapters

            self.lora_pack, self.lora_names = pack_adapters(adapters)
            self.lora_idx = jnp.zeros((max_batch,), jnp.int32)

        # page-table device mirror refresh is batched to one upload per
        # decode dispatch (allocator changes only set this flag)
        self._tables_dirty = False
        # set by the scheduler loop: paged non-speculative scheduling
        # admits asynchronously (first-token fetch deferred)
        self._defer_admit = False
        self.pending: "queue.Queue[_Request]" = queue.Queue()
        # out-of-pages retries and retire continuations go HERE, not back
        # into pending: a tail requeue would let later arrivals jump ahead
        # of a request that already waited (unbounded under sustained
        # pressure -> TTFT p95 blow-up); the scheduler drains this
        # front-of-line list before pending each iteration
        self._retry: List[_Request] = []
        self.slots: List[Optional[_Request]] = [None] * max_batch
        self._admitting: List[_Request] = []   # mid-admission, for the crash handler
        # admissions by path: solo b=1 prefills vs rows sharing a batched
        # group prefill (plus prefix-cache hits in self.stats when enabled)
        self.admit_stats = {"solo": 0, "grouped": 0}
        # batch-occupancy accounting, updated once per decode round by the
        # scheduler: mean(active_rows/max_batch) over rounds is the
        # sustained-load utilization the serving bench reports
        self.occupancy = {"rounds": 0, "active_rows": 0}
        self.error: Optional[BaseException] = None
        # opt-in scheduler event log (perf diagnosis): set
        # ``batcher.events = []`` and every admission / decode round /
        # retry appends ``(t, kind, detail)``; None (default) costs nothing
        self.events: Optional[List[tuple]] = None
        self._rid = 0
        self._lock = threading.Lock()
        self._stop = False
        # warmup sets this to queue a whole burst before the scheduler may
        # admit, forcing the grouped-admission path deterministically
        self._hold_admission = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _ev(self, kind: str, **detail):
        if self.events is not None:
            self.events.append((time.perf_counter(), kind, detail))

    # ---- client API ----
    def _vis_tokens(self, numtoks: Optional[int], pixel_values=None,
                    image_size=None) -> int:
        """Visual tokens one image splices in: ``numtoks`` for a single
        tile, the exact anyres merge count for a multi-tile stack."""
        n = numtoks if numtoks is not None else self.cfg.vision.num_patches
        if pixel_values is not None:
            px = np.asarray(pixel_values)
            if px.ndim == 4 and (px.shape[0] > 1 or image_size is not None):
                from ..models.llava import anyres_token_count

                size = tuple(image_size) if image_size else \
                    (self.cfg.vision.image_size, self.cfg.vision.image_size)
                return anyres_token_count(self.cfg, size, int(px.shape[0]), n)
        return n

    def spliced_len(self, input_ids: np.ndarray, numtoks: Optional[int],
                    pixel_values=None, image_size=None) -> int:
        """Prompt length after image-token splice — what prefill must fit."""
        from ..constants import IMAGE_TOKEN_INDEX

        ids = np.asarray(input_ids).reshape(-1)
        n_img = int((ids == IMAGE_TOKEN_INDEX).sum())
        if n_img == 0:
            return ids.shape[0]
        n = self._vis_tokens(numtoks, pixel_values, image_size)
        return ids.shape[0] + n_img * (n - 1)

    def fits(self, input_ids: np.ndarray, numtoks: Optional[int],
             pixel_values=None, image_size=None) -> bool:
        """True when the prompt fits the pool's prefill region; callers
        should route oversized prompts to the solo generate path."""
        return self.spliced_len(input_ids, numtoks, pixel_values,
                                image_size) <= self.L

    def submit(self, input_ids: np.ndarray, pixel_values=None,
               numtoks: Optional[int] = None,
               max_new_tokens: int = 128,
               lora_id: Optional[str] = None,
               image_size: Optional[tuple] = None,
               constraint_regex: Optional[str] = None) -> _Request:
        if lora_id is not None and lora_id not in self.lora_names:
            raise KeyError(f"unknown LoRA adapter {lora_id!r}; loaded: "
                           f"{sorted(k for k in self.lora_names if k)}")
        if constraint_regex is not None:
            if self.fsm_vocab is None:
                raise ValueError(
                    "constrained decoding needs the batcher constructed "
                    "with fsm_vocab= (the decoded piece per token id, e.g. "
                    "constrained.vocab_from_tokenizer(tokenizer))")
            tables = self._fsm_tables(constraint_regex)   # raises on bad
            n_live = tables[0].shape[0] - 1
            if n_live > self.fsm_quota:
                raise ValueError(
                    f"constraint DFA needs {n_live} states > per-request "
                    f"quota {self.fsm_quota}; raise max_fsm_states")
        if pixel_values is not None:
            from ..constants import IMAGE_TOKEN_INDEX

            px = np.asarray(pixel_values)
            n_img = int((np.asarray(input_ids).reshape(-1)
                         == IMAGE_TOKEN_INDEX).sum())
            if px.ndim == 4 and px.shape[0] > 1 and n_img > 1:
                # A (n, 3, H, W) stack with several <image> tokens is a
                # multi-image request, not anyres tiles of one image; the
                # anyres prefill would merge the images as if they were a
                # tile grid and spliced_len would over-count.  Mirror the
                # worker-level multi-image exclusion: route to solo generate.
                raise ValueError(
                    "multi-image prompts are not batchable; use the solo "
                    "generate path (the pool treats a multi-frame stack as "
                    "anyres tiles of one image)")
        if not self.fits(input_ids, numtoks, pixel_values, image_size):
            # a negative left-pad would crash the scheduler thread and take
            # the whole pool down with it; reject just this request instead
            raise ValueError(
                f"prompt ({self.spliced_len(input_ids, numtoks, pixel_values, image_size)} "
                f"spliced tokens) exceeds the pool prefill region ({self.L}); "
                f"use the solo generate path or raise --pool-prefill-len")
        req = _Request(0, np.asarray(input_ids, np.int32),
                       None if pixel_values is None
                       else np.asarray(pixel_values, np.float32),
                       numtoks, max_new_tokens, lora_id,
                       image_size=tuple(image_size) if image_size else None,
                       constraint=constraint_regex)
        # the lock spans the error check and the enqueue so the crash
        # handler (which drains pending under the same lock) can never
        # miss a request submitted concurrently with scheduler death
        with self._lock:
            self._rid += 1
            req.rid = self._rid
            if self.error is not None:   # scheduler already dead
                req.out_queue.put(None)
                return req
            self.pending.put(req)
        self._ev("submit", rid=req.rid)
        return req

    def cancel(self, req: _Request):
        """Stop decoding a request early (client stop-string hit or
        disconnect).  Thread-safe: only flips a flag — the scheduler
        thread retires the row (frees pages, ends the stream) at its
        next emission or admission round.  Without this, an abandoned
        stream keeps its slot decoding to max_new_tokens."""
        req.cancelled = True

    def stream(self, req: _Request):
        """Yield np arrays of new token ids until the request finishes.

        Raises :class:`BatchError` when the pool aborted the request."""
        while True:
            item = req.out_queue.get()
            if item is None:
                return
            if isinstance(item, _StreamError):
                raise BatchError(item.message, item.code)
            yield item

    def warmup(self, with_image: bool = True,
               numtoks: Optional[int] = None,
               batch_sizes: Optional[tuple] = None) -> float:
        """Precompile every trace the serving load pattern can hit BEFORE
        real traffic: a cold compile that lands mid-load shows up directly
        in user-visible TTFT (round 3 measured a 12s/25s TTFT staircase
        from exactly this).  Covers:

        * the solo b=1 prefill + decode-chunk traces (one real request);
        * per batch size g (powers of two up to ``max_batch`` by default)
          the FULL grouped-admission path — not just the (g, L) batched
          prefill trace but also the eager host ops around it (the (g, V)
          argmax token pick, the per-row cache split slices, the paged
          import) that a direct ``_prefill_fn`` warmup misses and that
          each cost a mid-load jit compile;
        * with the prefix cache enabled, the cached-prefix hit path
          (suffix-only prefill + new-page import), by resubmitting an
          identical near-``L``-length prompt.

        Grouping is forced deterministically: ``_hold_admission`` parks
        the scheduler's admission loop while the g requests queue, so
        they always land as ONE group of exactly g.  Returns wall seconds
        spent (the cold-start cost the first users would otherwise pay).
        """
        import time as _time

        from ..constants import IMAGE_TOKEN_INDEX

        t0 = _time.time()
        if batch_sizes is None:
            batch_sizes = tuple(g for g in (2, 4, 8, 16, 32, 64)
                                if g <= self.max_batch)
        s = self.cfg.vision.image_size

        def _make(i: int, text_len: int = 3):
            ids = np.full((1, text_len), 9, np.int32)
            ids[0, 0] = 5 + i
            ids[0, 1] = IMAGE_TOKEN_INDEX if with_image else 7
            px = None
            if with_image:
                # distinct pixel content per request: group members must
                # MISS the prefix cache or they'd take the hit path and
                # skip the grouped prefill this warmup exists to compile
                px = np.zeros((1, 3, s, s), np.float32)
                px[0, 0, 0, 0] = float(i)
            return ids, px

        def _drain(reqs):
            for r in reqs:
                for _ in self.stream(r):
                    pass

        ids, px = _make(0)
        _drain([self.submit(ids, px, numtoks=numtoks,
                            max_new_tokens=self.chunk + 1)])
        if self.index is not None:
            # prefix-hit path: a near-L prompt so full pages register
            # (reg_n >= 1) and the cached prefix covers the image span,
            # then an identical resubmit takes the suffix-prefill trace
            n = (numtoks if numtoks is not None
                 else self.cfg.vision.num_patches)
            text_len = self.L - n + (1 if with_image else 0)
            if text_len >= 3:
                ids_p, px_p = _make(0, text_len=text_len)
                _drain([self.submit(ids_p, px_p, numtoks=numtoks,
                                    max_new_tokens=2)])
                _drain([self.submit(ids_p, px_p, numtoks=numtoks,
                                    max_new_tokens=2)])
        for g in batch_sizes:
            self._hold_admission = True
            try:
                _time.sleep(0.05)   # let any in-flight admission pass end
                reqs = [self.submit(*_make(i + 1), numtoks=numtoks,
                                    max_new_tokens=2) for i in range(g)]
            finally:
                self._hold_admission = False
            _drain(reqs)
        return _time.time() - t0

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=5)
        # Release the multi-GB device state (params ref, KV pools, LoRA
        # wrap cache): a shut-down batcher object that stays referenced
        # (e.g. a bench/driver local) must not pin them — the bench's
        # int4 section OOM'd the 16GB chip on exactly this (round 5).
        for attr in ("params", "paged", "pool", "_wrapped_cache",
                     "_adapter_trees", "lora_pack"):
            if hasattr(self, attr):
                setattr(self, attr, None)

    # ---- scheduler ----
    def _params_for(self, req: _Request):
        if req.lora_id is None:
            return self.params
        if req.lora_id not in self._wrapped_cache:
            from ..ops.lora import load_lora

            self._wrapped_cache[req.lora_id] = load_lora(
                self.params, self._adapter_trees[req.lora_id])
        return self._wrapped_cache[req.lora_id]

    def _key_seq(self, req: _Request):
        """Spliced token-key sequence for prefix caching, or None when the
        request shape isn't cacheable (multi-image).  anyres stacks key on
        the exact merge token count plus the tile bytes, tile count, and
        the original size (the unpad crop depends on it)."""
        import hashlib

        from ..constants import IMAGE_TOKEN_INDEX
        from .prefix_cache import build_key_seq

        ids = np.asarray(req.input_ids)
        if ids.shape[0] != 1 or (ids == IMAGE_TOKEN_INDEX).sum() > 1:
            return None, 0
        if req.pixel_values is None:
            return build_key_seq(ids, None, None, IMAGE_TOKEN_INDEX)
        if req.pixel_values.ndim != 4:
            return None, 0
        n = self._vis_tokens(req.numtoks, req.pixel_values, req.image_size)
        h = hashlib.blake2b(req.pixel_values.tobytes(), digest_size=8)
        h.update(repr((req.pixel_values.shape[0], req.image_size)).encode())
        img_hash = int.from_bytes(h.digest(), "little")
        return build_key_seq(ids, n, img_hash, IMAGE_TOKEN_INDEX)

    def _try_admit_prefix(self, req: _Request, slot: int):
        """Admit via cached prefix pages + suffix-only prefill.  Returns
        True when handled; None to fall through to the full-prefill path."""
        from .prefix_cache import (_suffix_prefill_fn, chain_hashes,
                                   import_page_range)

        if req.constraint is not None:
            # the hit path selects the first token before FSM installation
            # could mask it — constrained requests take the full-prefill
            # path (guarded HERE, not just in _admit: the scheduler loop
            # also calls this directly for burst admissions)
            return None
        key_seq, text_resume = self._key_seq(req)
        if key_seq is None:
            return None
        T = len(key_seq)
        if T + 1 > self.capacity:
            return None
        hashes = chain_hashes(key_seq, self.page_size,
                              salt=req.lora_id or "")
        max_h = min(len(hashes), (T - 1) // self.page_size)
        hits = self.index.lookup(hashes[:max_h])
        H = len(hits)
        if H == 0 or H * self.page_size < text_resume:
            self.stats["prefix_misses"] += 1
            return None

        if not self.alloc.allocate_row(slot, T, headroom=self._headroom,
                                       shared=hits):
            # flushing the cached set may free exactly the pages `hits`
            # points at (their index entries are dropped with them), so the
            # lookup must be redone — retrying with the stale list would
            # re-ref pages that just went back on the free list and hand
            # the same physical page out twice
            self.index.drop_pages(self.alloc.flush_cached())
            hits = self.index.lookup(hashes[:max_h])
            H = len(hits)
            if H == 0 or H * self.page_size < text_resume:
                self.stats["prefix_misses"] += 1
                return None
            if not self.alloc.allocate_row(slot, T, headroom=self._headroom,
                                           shared=hits):
                return None                       # pool pressure: full path
        n_prefix = H * self.page_size
        # suffix is pure text: map spliced positions back to input ids
        ids = np.asarray(req.input_ids).reshape(-1)
        if text_resume > 0:                      # image inside the prefix
            n = self._vis_tokens(req.numtoks, req.pixel_values,
                                 req.image_size)
            suffix = ids[n_prefix - n + 1:]
        else:
            suffix = ids[n_prefix:]
        t_suf = len(suffix)
        s_suf = _round_up(max(t_suf, 1), 64)

        n_layers = self.paged.k.shape[0]
        n_kv, dh = self.paged.k.shape[3], self.paged.k.shape[4]
        sel = jnp.asarray(np.asarray(hits, np.int32))
        k_sel = self.paged.k[:, sel].reshape(n_layers, n_prefix, n_kv, dh)
        v_sel = self.paged.v[:, sel].reshape(n_layers, n_prefix, n_kv, dh)
        if self.paged.k_scale is not None:
            # int8 pool: dequantize the gathered prefix for the dense
            # suffix prefill (compute-bound; the bf16 blow-up is transient)
            mdt = jnp.dtype(self.cfg.llama.dtype)
            ks = self.paged.k_scale[:, sel].reshape(n_layers, n_prefix, n_kv)
            vs = self.paged.v_scale[:, sel].reshape(n_layers, n_prefix, n_kv)
            k_sel = (k_sel.astype(jnp.float32) * ks[..., None]).astype(mdt)
            v_sel = (v_sel.astype(jnp.float32) * vs[..., None]).astype(mdt)
        ids_p = jnp.asarray(
            np.pad(suffix, (0, s_suf - t_suf)).astype(np.int32))[None]
        valid = jnp.asarray(np.arange(s_suf) < t_suf)[None]
        fn = _suffix_prefill_fn(self.cfg, n_prefix, s_suf, self.capacity)
        logits, dense, lengths = fn(self._params_for(req), k_sel, v_sel,
                                    ids_p, valid)

        n_total = int(self.alloc.n_alloc[slot])
        n_new = n_total - H
        if n_new > 0:
            self.paged = import_page_range(
                self.paged, dense, H, n_new,
                self.alloc.tables[slot][H:n_total], self.page_size)
        self._tables_dirty = True
        reg_n = T // self.page_size
        if reg_n > H:
            self.index.register(hashes[H:reg_n],
                                self.alloc.tables[slot][H:reg_n].tolist())
            self.alloc.pin(self.alloc.tables[slot][H:reg_n].tolist())
        self.stats["prefix_hits"] += 1
        self.stats["prefix_pages_reused"] += H

        first, _ = _select_token(logits, self.gen_cfg, jax.random.PRNGKey(0))
        self._complete_admit(req, slot, first, T)
        self._ev("admit_prefix", rid=req.rid, slot=slot, pages=H)
        return True

    def _complete_admit(self, req: _Request, slot: int, first, host_len: int):
        """Activate an admitted request: asynchronously under the paged
        pipelined scheduler (first token stays a device future), else
        through the synchronous finish.  Constrained requests always
        finish synchronously (the DFA advance needs the token value) and
        so do budget-1 requests (activating them would over-emit)."""
        if (self._defer_admit and req.constraint is None
                and req.max_new_tokens > 1 and not req.cancelled):
            self._activate_rows([(req, slot)], first[0:1], [host_len])
        else:
            self._finish_admit(req, slot, first[0:1], host_len)

    def _activate_rows(self, members, first_sel, host_lens):
        """Activate admitted rows WITHOUT any host sync (round-5 fix for
        the sustained-serving stall: the old per-admission first-token
        fetch blocked the scheduler behind the in-flight decode round +
        the prefill, leaving the device idle ~45% of a saturated window).

        Device-side state updates only; ``first_sel`` (G,) stays a device
        future.  The host reads the value out of the NEXT decode round's
        ``tokens_in`` echo output when that round is processed (the row
        joins it in this same scheduler iteration) — never via a direct
        fetch, which the tunneled platform can block behind the round's
        compile+execution (it consumes this buffer's lineage).  An EOS
        first token deactivates its row on device (``first != eos``); the
        row is then retired by the next round's processing, exactly like
        a row that hits EOS mid-decode."""
        sel = jnp.asarray(np.asarray([s for _, s in members], np.int32))
        self.tokens = self.tokens.at[sel].set(first_sel)
        self.lengths = self.lengths.at[sel].set(
            jnp.asarray(np.asarray(host_lens, np.int32)))
        self.budget = self.budget.at[sel].set(jnp.asarray(np.asarray(
            [r.max_new_tokens - 1 for r, _ in members], np.int32)))
        self.active = self.active.at[sel].set(
            first_sel != self.gen_cfg.eos_token_id)
        if self.lora_idx is not None:
            self.lora_idx = self.lora_idx.at[sel].set(
                jnp.asarray(np.asarray([self.lora_names.get(r.lora_id, 0)
                                        for r, _ in members], np.int32)))
        if self.fsm_vocab is not None:
            # deferred admissions are never constrained: free state
            self.fsm_state = self.fsm_state.at[sel].set(1)
        for i, (req, slot) in enumerate(members):
            req.len0 = int(host_lens[i])
            req.pending = True
            req.slot = slot
            self.slots[slot] = req

    def _emit_pending_first(self, req: _Request, tok: int):
        """Deliver a deferred admission's first token to the client and
        host history (from the processed round's ``tokens_in`` echo, or
        the requeue fallback's state fetch)."""
        req.pending = False
        req.out_queue.put(np.asarray([tok], np.int32))
        req.emitted += 1
        req.generated.append(tok)

    def _sync_tables(self):
        """Refresh the device page-table mirror at most once per decode
        dispatch (allocator mutations only mark it dirty)."""
        if self._tables_dirty:
            self.tables = jnp.asarray(self.alloc.tables)
            self._tables_dirty = False

    def _finish_admit(self, req: _Request, slot: int, first, length: int):
        """Synchronous admission finish (host-syncs on the prefill): emit
        the prefill token and either activate the row or finish the
        request immediately (first token is EOS, or the budget was 1 —
        activating such a row would over-emit past the budget).
        ``length`` is the host-computed spliced prompt length."""
        first_tok = int(np.asarray(first)[0])
        req.len0 = int(length)
        req.out_queue.put(np.asarray(first))
        req.emitted += 1
        req.generated.append(first_tok)
        if self.fsm_vocab is not None:
            if req.fsm is not None:           # constrained: advance the DFA
                trans_l, offset, start = req.fsm
                nxt = int(trans_l[start, first_tok])
                state = 0 if nxt == 0 else offset + nxt - 1
            else:
                state = 1                     # unconstrained: free row
            self.fsm_state = self.fsm_state.at[slot].set(state)
        if first_tok == self.gen_cfg.eos_token_id or req.max_new_tokens <= 1:
            req.out_queue.put(None)
            if self.backend == "paged":
                self.alloc.free_row(slot)
                self._tables_dirty = True
            return
        self.tokens = self.tokens.at[slot].set(first[0])
        self.lengths = self.lengths.at[slot].set(int(length))
        self.active = self.active.at[slot].set(True)
        self.budget = self.budget.at[slot].set(req.max_new_tokens - 1)
        if self.lora_idx is not None:
            self.lora_idx = self.lora_idx.at[slot].set(
                self.lora_names.get(req.lora_id, 0))
        req.slot = slot
        self.slots[slot] = req

    def _pad_ids(self, reqs) -> tuple:
        """Left-pad raw prompt ids to the fixed ``(G, self.L)`` prefill
        shape plus validity mask.  Fixing T at ``self.L`` means ONE jit
        trace per group size instead of one per prompt length (the spliced
        forward already runs over ``out_len=self.L`` regardless, so the
        pad costs nothing but the masked embedding lookups)."""
        G = len(reqs)
        ids = np.full((G, self.L), self.gen_cfg.pad_token_id, np.int32)
        mask = np.zeros((G, self.L), bool)
        for g, r in enumerate(reqs):
            flat = np.asarray(r.input_ids, np.int32).reshape(-1)
            ids[g, self.L - flat.shape[0]:] = flat
            mask[g, self.L - flat.shape[0]:] = True
        return jnp.asarray(ids), jnp.asarray(mask)

    def _fsm_tables(self, pattern: str):
        """Compile a constraint's local token tables; bounded LRU memo
        (each entry holds ~(quota, V) bool+int32 arrays — an unbounded
        cache leaks under per-request schemas embedding request data)."""
        if pattern not in self._fsm_cache:
            from .constrained import build_token_tables, compile_regex

            dfa = compile_regex(pattern)
            allow, trans = build_token_tables(
                dfa, self.fsm_vocab, self.gen_cfg.eos_token_id,
                special_ids=[self.gen_cfg.pad_token_id,
                             *getattr(self, "_fsm_pad_ids", [])])
            self._fsm_cache[pattern] = (allow, trans, dfa.start)
            while len(self._fsm_cache) > 32:
                self._fsm_cache.popitem(last=False)
        self._fsm_cache.move_to_end(pattern)
        return self._fsm_cache[pattern]

    def _install_fsm(self, req: _Request, slot: int, logits):
        """Place the request's DFA span into the slot's table-pool region
        and mask the prefill logits with the start state's allow row.
        Local state s>0 maps to pool row offset+s-1; 0 stays the dead row.
        The device pools update only the slot's span in place — a full
        re-upload costs ~80MB host->device per admission at 7B vocab."""
        allow_l, trans_l, start = self._fsm_tables(req.constraint)
        if req.fsm_resume is not None:
            start = req.fsm_resume     # continuation: DFA mid-match
        n = allow_l.shape[0]
        offset = 2 + slot * self.fsm_quota
        remap = np.where(trans_l[1:n] == 0, 0,
                         offset + trans_l[1:n] - 1).astype(np.int32)
        self.fsm_allow = jax.lax.dynamic_update_slice(
            self.fsm_allow, jnp.asarray(allow_l[1:n]), (offset, 0))
        self.fsm_trans = jax.lax.dynamic_update_slice(
            self.fsm_trans, jnp.asarray(remap), (offset, 0))
        req.fsm = (trans_l, offset, start)
        return jnp.where(jnp.asarray(allow_l[start])[None], logits, -1e30)

    def _admit(self, req: _Request, slot: int, try_prefix: bool = True) -> bool:
        if (try_prefix and self.backend == "paged" and self.index is not None
                and req.constraint is None):
            handled = self._try_admit_prefix(req, slot)
            if handled is not None:
                return handled
        t0 = time.perf_counter()
        n = req.numtoks if req.numtoks is not None else self.cfg.vision.num_patches
        if req.pixel_values is not None and (req.pixel_values.shape[0] > 1
                                             or req.image_size is not None):
            # anyres multi-tile: same left-padded (1, L) cache layout as
            # the single-tile prefill, so pool insertion is identical
            from ..generate import _prefill_anyres_fn

            size = req.image_size or (self.cfg.vision.image_size,
                                      self.cfg.vision.image_size)
            prefill = _prefill_anyres_fn(
                self.cfg, n, int(req.pixel_values.shape[0]), tuple(size),
                self.L, self.capacity)
            logits, cache, lengths = prefill(
                self._params_for(req), jnp.asarray(req.input_ids),
                jnp.asarray(req.pixel_values))
        elif req.pixel_values is not None:
            prefill = _prefill_fn(self.cfg, n, self.L, self.capacity)
            ids_p, mask = self._pad_ids([req])
            logits, cache, lengths, _ = prefill(
                self._params_for(req), ids_p,
                jnp.asarray(req.pixel_values), mask)
        else:
            from ..generate import _prefill_text_fn

            ids_p, mask = self._pad_ids([req])
            logits, cache, lengths = _prefill_text_fn(
                self.cfg, self.L, self.capacity)(self._params_for(req),
                                                 ids_p, mask)

        if req.constraint is not None:
            logits = self._install_fsm(req, slot, logits)
        first, _ = _select_token(logits, self.gen_cfg, jax.random.PRNGKey(0))

        # host-computed spliced length == the prefill's device `lengths`
        # (submit() guarantees it fits self.L) — no sync needed
        T = self.spliced_len(req.input_ids, req.numtoks, req.pixel_values,
                             req.image_size)
        if self.backend == "paged":
            if not self._insert_paged(req, slot, cache, T):
                return False
        else:
            self._insert_dense(slot, cache)
        self._complete_admit(req, slot, first, T)
        self.admit_stats["solo"] += 1
        self._ev("admit_solo", rid=req.rid, slot=slot,
                 ms=(time.perf_counter() - t0) * 1e3)
        return True

    def _admit_group(self, members) -> bool:
        """Admit several compatible requests with ONE batched prefill.

        ``members`` is a list of ``(req, slot)`` pairs that share the
        batched-prefill signature (all plain single-image with the same
        numtoks and lora_id, or all text-only with the same lora_id).
        Serial b=1 admissions cost ~full-weight-read each; one (G, L)
        prefill reads the weights once and scales only in FLOPs, so
        admission throughput under burst arrivals improves ~Gx (the
        reference worker's per-request generation threads never batch
        prefill at all: llava/serve/model_worker.py:240-268).  Under the
        paged backend the whole group imports with ONE donated jit
        (paged_cache.import_prefill_group) and activates with one batched
        update; allocation failures requeue per-row as before."""
        t0 = time.perf_counter()
        reqs = [r for r, _ in members]
        params = self._params_for(reqs[0])
        ids_p, mask = self._pad_ids(reqs)
        if reqs[0].pixel_values is not None:
            n = (reqs[0].numtoks if reqs[0].numtoks is not None
                 else self.cfg.vision.num_patches)
            px = jnp.asarray(np.concatenate(
                [np.asarray(r.pixel_values, np.float32) for r in reqs], 0))
            prefill = _prefill_fn(self.cfg, n, self.L, self.capacity)
            logits, cache, lengths, _ = prefill(params, ids_p, px, mask)
        else:
            from ..generate import _prefill_text_fn

            logits, cache, lengths = _prefill_text_fn(
                self.cfg, self.L, self.capacity)(params, ids_p, mask)

        first, _ = _select_token(logits, self.gen_cfg, jax.random.PRNGKey(0))
        host_lens = [self.spliced_len(r.input_ids, r.numtoks,
                                      r.pixel_values, r.image_size)
                     for r in reqs]
        ok_any = False
        if self.backend == "paged":
            from .paged_cache import import_prefill_group

            ok = [(g, req, slot) for g, (req, slot) in enumerate(members)
                  if self._alloc_pages(req, slot, host_lens[g])]
            if ok:
                # ONE donated jit scatters every admitted row's pages
                # (failed rows keep an all-trash table); trace keyed by
                # the group size alone
                G, n_pt = len(members), self.pages_per_row
                tables = np.zeros((G, n_pt), np.int32)
                pads = np.zeros((G,), np.int32)
                for g, req, slot in ok:
                    tables[g] = self.alloc.tables[slot][:n_pt]
                    pads[g] = self.L - host_lens[g]
                self.paged = import_prefill_group(
                    self.paged, cache, pads, tables, self.page_size)
                for g, req, slot in ok:
                    self._register_prefix_pages(req, slot, host_lens[g])
                defer = [(g, req, slot) for g, req, slot in ok
                         if self._defer_admit and req.max_new_tokens > 1
                         and not req.cancelled]
                if defer:
                    sel = jnp.asarray(
                        np.asarray([g for g, _, _ in defer], np.int32))
                    self._activate_rows(
                        [(req, slot) for _, req, slot in defer],
                        first[sel], [host_lens[g] for g, _, _ in defer])
                deferred = {g for g, _, _ in defer}
                for g, req, slot in ok:
                    if g not in deferred:
                        self._finish_admit(req, slot, first[g:g + 1],
                                           host_lens[g])
                    self.admit_stats["grouped"] += 1
                ok_any = True
        else:
            for g, (req, slot) in enumerate(members):
                row = KVCache(k=cache.k[:, g:g + 1], v=cache.v[:, g:g + 1],
                              valid=cache.valid[g:g + 1],
                              positions=cache.positions[g:g + 1],
                              write_idx=cache.write_idx,
                              k_scale=None if cache.k_scale is None
                              else cache.k_scale[:, g:g + 1],
                              v_scale=None if cache.v_scale is None
                              else cache.v_scale[:, g:g + 1])
                self._insert_dense(slot, row)
                self._finish_admit(req, slot, first[g:g + 1], host_lens[g])
                self.admit_stats["grouped"] += 1
                ok_any = True
        self._ev("admit_group", rids=[r.rid for r in reqs],
                 ms=(time.perf_counter() - t0) * 1e3)
        return ok_any

    @staticmethod
    def _group_key(req: _Request):
        """Batched-prefill compatibility key, or None when the request must
        admit solo (anyres tile stacks trace per tile count/size;
        constrained requests need per-request first-token masking)."""
        if req.constraint is not None:
            return None
        if req.pixel_values is None:
            return ("text", req.lora_id)
        if req.pixel_values.ndim == 4 and req.pixel_values.shape[0] == 1 \
                and req.image_size is None:
            return ("img", req.lora_id, req.numtoks)
        return None

    def _insert_dense(self, slot: int, cache: KVCache):
        # insert row `slot`: kv (n_layers, B, S, ...) axis 1; valid/positions
        # (B, S) axis 0.  The pool's write_idx may have advanced past this
        # request's prefill; its unwritten slots stay invalid, which the
        # position-based attention masks handle exactly.
        self.pool = KVCache(
            k=jax.lax.dynamic_update_slice(self.pool.k, cache.k, (0, slot, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(self.pool.v, cache.v, (0, slot, 0, 0, 0)),
            valid=jax.lax.dynamic_update_slice(self.pool.valid, cache.valid, (slot, 0)),
            positions=jax.lax.dynamic_update_slice(self.pool.positions,
                                                   cache.positions, (slot, 0)),
            write_idx=self.pool.write_idx,
            k_scale=None if self.pool.k_scale is None
            else jax.lax.dynamic_update_slice(self.pool.k_scale,
                                              cache.k_scale, (0, slot, 0)),
            v_scale=None if self.pool.v_scale is None
            else jax.lax.dynamic_update_slice(self.pool.v_scale,
                                              cache.v_scale, (0, slot, 0)),
        )

    def _alloc_pages(self, req: _Request, slot: int, T: int) -> bool:
        """Allocate row ``slot``'s pages for a ``T``-token prefill.
        On pool pressure the request retries at the front of the line;
        a request that can never fit gets an explicit error."""
        ok = self.alloc.allocate_row(slot, T, headroom=self._headroom)
        if not ok and self.index is not None and self.alloc.cached:
            self.index.drop_pages(self.alloc.flush_cached())
            ok = self.alloc.allocate_row(slot, T, headroom=self._headroom)
        if not ok:
            need = -(-(T + self._headroom) // self.page_size)
            if need > min(self.pages_per_row, self.alloc.n_allocatable):
                # can never fit, even with the whole pool free: an
                # explicit error, not a clean end-of-stream (and not an
                # eternal front-of-line retry — the old pages_per_row-only
                # check livelocked on pools smaller than one full row)
                req.out_queue.put(_StreamError(
                    f"request needs {need} KV pages but the pool can "
                    f"serve at most "
                    f"{min(self.pages_per_row, self.alloc.n_allocatable)} "
                    f"per row; raise n_pages or shorten the prompt"))
                req.out_queue.put(None)
            else:        # out of pages now: retry at the FRONT of the line
                if self.index is not None:
                    self.stats["admit_retries"] += 1
                self._retry.append(req)
                self._ev("retry_pages", rid=req.rid)
            return False
        self._tables_dirty = True
        return True

    def _register_prefix_pages(self, req: _Request, slot: int, T: int):
        """Register a freshly imported row's full pages with the prefix
        index (no-op without the prefix cache)."""
        if self.index is None:
            return
        from .prefix_cache import chain_hashes

        key_seq, _ = self._key_seq(req)
        if key_seq is not None and len(key_seq) == T:
            reg_n = T // self.page_size
            if reg_n > 0:
                hashes = chain_hashes(key_seq, self.page_size,
                                      salt=req.lora_id or "")
                pages = self.alloc.tables[slot][:reg_n].tolist()
                self.index.register(hashes[:reg_n], pages)
                self.alloc.pin(pages)

    def _insert_paged(self, req: _Request, slot: int, cache: KVCache,
                      T: int) -> bool:
        from .paged_cache import import_prefill

        if not self._alloc_pages(req, slot, T):
            return False
        self.paged = import_prefill(self.paged, cache, self.L - T,
                                    self.alloc.tables[slot],
                                    int(self.alloc.n_alloc[slot]),
                                    self.page_size)
        self._register_prefix_pages(req, slot, T)
        return True

    def _propose_drafts(self):
        """Prompt-lookup drafts for every pool row (host-side): continue the
        most recent earlier occurrence of each row's trailing n-gram over
        prompt+generated — the same proposer as the solo on-device loop
        (generate._ngram_propose), run on host where the per-request
        histories already live.  Rows without a request draft zeros; their
        verify lanes are masked anyway."""
        from ..generate import _ngram_propose

        drafts = np.zeros((self.max_batch, self.spec_k), np.int32)
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            ids = np.asarray(req.input_ids).reshape(-1).tolist()
            ids += req.generated
            drafts[slot] = _ngram_propose(ids, self.spec_k, self.spec_ngram)
        return jnp.asarray(drafts)

    def _ensure_pages(self, pipelined: bool = False):
        """Grow each active row to cover the next chunk; rows that cannot
        be extended (pool exhausted) are freed and requeued at the front
        of the line with prompt+generated-so-far — per-row, not
        pool-wide, and never a silent truncation that looks like a normal
        finish (same contract as the dense _retire_all).

        ``pipelined``: compute row lengths host-side instead of fetching
        ``self.lengths`` — that fetch would block on the round still in
        flight and serialize the pipelined decode loop.  The host view
        (post-prefill length + tokens emitted) lags the device by the
        unprocessed in-flight round, so one extra ``chunk`` of margin is
        added (over-provisions by at most one page per row)."""
        if not pipelined:
            lengths = np.asarray(self.lengths)
        changed = False
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            if pipelined:
                # an unresolved deferred first token counts as one
                # generated token the host hasn't seen yet
                gen = len(req.generated) + (1 if req.pending else 0)
                cur = req.len0 + gen - 1 + self.chunk
            else:
                cur = int(lengths[slot])
            need = cur + self._headroom
            ok = True
            while self.alloc.capacity(slot) < need:
                if not self.alloc.extend_row(slot):
                    if self.index is not None and self.alloc.cached:
                        self.index.drop_pages(self.alloc.flush_cached())
                        continue
                    ok = False
                    break
                changed = True
            if not ok:
                self.slots[slot] = None
                self.alloc.free_row(slot)
                changed = True
                self.active = self.active.at[slot].set(False)
                self._requeue_inflight(req, "out of KV pages mid-decode")
        if changed:
            self._tables_dirty = True

    def _requeue_inflight(self, req: _Request, reason: str):
        self._ev("requeue", rid=req.rid, reason=reason)
        """Resume a mid-flight request through the front-of-line retry
        with prompt+generated (its row is already freed).  A request that
        can no longer fit gets an explicit error chunk."""
        if req.pending:
            # deferred admission requeued before any round echoed its
            # first token (a pool so tight _ensure_pages fails in the
            # same iteration): fetch it from the row state now — safe
            # here because the next round consuming self.tokens has NOT
            # been dispatched yet — or the continuation would rebuild
            # the same prompt with no progress (a livelock)
            self._emit_pending_first(
                req, int(np.asarray(self.tokens[req.slot])))
        remaining = req.max_new_tokens - len(req.generated)
        if remaining <= 0:
            req.out_queue.put(None)
            return
        ids = np.concatenate(
            [np.asarray(req.input_ids).reshape(-1).astype(np.int32),
             np.asarray(req.generated, np.int32)])[None]
        if not self.fits(ids, req.numtoks, req.pixel_values,
                         req.image_size):
            req.out_queue.put(_StreamError(
                f"request aborted: {reason} and the continuation prompt "
                f"no longer fits the pool prefill region"))
            req.out_queue.put(None)
            return
        cont = _Request(req.rid, ids, req.pixel_values, req.numtoks,
                        remaining, req.lora_id, out_queue=req.out_queue,
                        emitted=req.emitted, image_size=req.image_size,
                        constraint=req.constraint)
        if req.constraint is not None and req.fsm is not None:
            # resume the DFA after the tokens already emitted — starting
            # over would re-match the regex against only the continuation
            trans_l, _, start = req.fsm
            s = start
            for t in req.generated:
                s = int(trans_l[s, int(t)])
                if s == 0:
                    break
            if s == 0:     # cannot happen under masked decode; be loud
                req.out_queue.put(_StreamError(
                    "request aborted: constraint DFA state lost across "
                    "an out-of-pages requeue"))
                req.out_queue.put(None)
                return
            cont.fsm_resume = s
        self._retry.append(cont)

    def _loop(self):
        try:
            self._loop_inner()
        except Exception as e:     # noqa: BLE001 — scheduler death must not
            # strand clients: fail every active and pending stream
            import traceback

            traceback.print_exc()
            # the lock pairs with submit(): once error is set under the
            # lock, no new request can slip into pending after the drain
            with self._lock:
                self.error = e
                for inflight in getattr(self, "_admitting", []):
                    inflight.out_queue.put(None)
                self._admitting = []
                for slot, req in enumerate(self.slots):
                    if req is not None:
                        req.out_queue.put(None)
                        self.slots[slot] = None
                for waiting in self._retry:
                    waiting.out_queue.put(None)
                self._retry = []
                while True:
                    try:
                        self.pending.get_nowait().out_queue.put(None)
                    except queue.Empty:
                        break

    def _loop_inner(self):
        if self.spec_k > 0:
            from .paged_cache import _paged_spec_verify_fn

            # the verify step always takes the gather path: an S-block
            # paged kernel variant was hardware-validated in round 4 but
            # measured SLOWER than the gather (34.7 vs 28.4 ms/verify at
            # 7B B=8 k=4 — the flat layout's Hkv-fold MXU over-compute
            # crosses over once S*Hkv >> page_size) and was deleted; see
            # docs/Architecture.md "negative results"
            decode = _paged_spec_verify_fn(
                self.cfg, self.gen_cfg, self.spec_k, self.pages_per_row,
                self.page_size, use_kernel=False)
        elif self.backend == "paged":
            from .paged_cache import _paged_pool_decode_fn

            decode = _paged_pool_decode_fn(
                self.cfg, self.gen_cfg, self.chunk, self.pages_per_row,
                self.page_size, self.use_kernel,
                fsm=self.fsm_vocab is not None)
        else:
            decode = _pool_decode_fn(self.cfg, self.gen_cfg, self.chunk)
        rng = jax.random.PRNGKey(0)
        # Software-pipeline the paged decode rounds: dispatch round k+1
        # before fetching round k's tokens, so the ~tens-of-ms host round
        # trip (result fetch + stream demux + dispatch through the device
        # tunnel) overlaps the device compute instead of serializing with
        # it (round-4 profile: 133ms device vs 208ms wall per round).
        # Safe because (a) inactive rows neither read nor write pages
        # (paged_attention scatters them to the trash page), (b) state
        # mutations between rounds (.at[].set merges, prefill imports)
        # enqueue on the device stream AFTER the in-flight round, and
        # (c) _process_round skips rows finalized since their snapshot.
        # Speculative decoding stays serial: its drafts are proposed from
        # host history, which pipelining would leave one round stale.
        pipelined = (self.backend == "paged" and self.spec_k == 0
                     and self.pipeline_rounds)
        # pipelined scheduling also defers admission finishes: prefill
        # results stay device futures until after the next round dispatch
        # (_activate_rows/_resolve_pending), so admissions cost the host
        # no sync at all
        self._defer_admit = pipelined
        inflight = None     # (toks, active, slots snapshot, dispatch time)
        while not self._stop:
            # Admit as many pending requests as there are free slots.
            # Prefix-cache hits admit immediately (suffix-only prefill);
            # the rest are grouped by batched-prefill compatibility and
            # admitted with one (G, L) prefill per group — see _admit_group.
            # warmup parks this phase (_hold_admission) to queue a burst
            # that must land as one group; decode of active rows goes on.
            admitted = False
            free = ([] if self._hold_admission else
                    [s for s in range(self.max_batch) if self.slots[s] is None])
            fallthrough = []            # (req, slot) pairs needing full prefill
            retry, self._retry = self._retry, []
            while free:
                if retry:
                    req = retry.pop(0)
                else:
                    try:
                        req = self.pending.get_nowait()
                    except queue.Empty:
                        break
                if req.cancelled:      # client stopped before admission
                    req.out_queue.put(None)
                    continue
                slot = free.pop(0)
                self._admitting.append(req)  # visible to the crash handler
                if self.backend == "paged" and self.index is not None:
                    # returns True (admitted via cached prefix) or None
                    # (fall through to full prefill — incl. under pool
                    # pressure, where _insert_paged front-requeues)
                    if self._try_admit_prefix(req, slot) is True:
                        self._admitting.remove(req)
                        admitted = True
                        continue
                fallthrough.append((req, slot))
            if retry:       # slots ran out first: keep waiting up front
                self._retry = retry + self._retry

            groups: Dict = {}
            for req, slot in fallthrough:
                groups.setdefault(self._group_key(req), []).append((req, slot))
            for key, members in groups.items():
                while members:
                    if key is None or len(members) == 1:
                        req, slot = members.pop(0)
                        ok = self._admit(req, slot, try_prefix=False)
                        self._admitting.remove(req)
                        admitted |= ok
                    else:
                        # power-of-two chunks bound the set of batched
                        # prefill traces to {2, 4, 8, ...}
                        g = 1 << (len(members).bit_length() - 1)
                        chunk, members = members[:g], members[g:]
                        admitted |= self._admit_group(chunk)
                        for req, _ in chunk:
                            self._admitting.remove(req)

            if pipelined:
                new_inflight = None
                if any(r is not None for r in self.slots):
                    self._ensure_pages(pipelined=True)
                if any(r is not None for r in self.slots):
                    self._sync_tables()
                    t_round = time.perf_counter()
                    rng, sub = jax.random.split(rng)
                    if self.fsm_vocab is not None:
                        (self.paged, self.tokens, self.lengths, self.budget,
                         self.active, toks, self.fsm_state, echo) = decode(
                             self.params["llama"], self.paged, self.tables,
                             self.lengths, self.tokens, self.budget,
                             self.active, sub, self.lora_pack, self.lora_idx,
                             self.fsm_allow, self.fsm_trans, self.fsm_state)
                    else:
                        (self.paged, self.tokens, self.lengths, self.budget,
                         self.active, toks, _, echo) = decode(
                             self.params["llama"], self.paged, self.tables,
                             self.lengths, self.tokens, self.budget,
                             self.active, sub, self.lora_pack, self.lora_idx)
                    new_inflight = (toks, echo, self.active,
                                    list(self.slots), t_round)
                if inflight is not None:
                    self._process_round(*inflight)
                elif new_inflight is None and not admitted:
                    time.sleep(0.005)
                inflight = new_inflight
                continue

            if not bool(np.asarray(self.active).any()):
                if not admitted:
                    time.sleep(0.005)
                continue

            t_round = time.perf_counter()
            rng, sub = jax.random.split(rng)
            if self.spec_k > 0:
                self._ensure_pages()
                if not bool(np.asarray(self.active).any()):
                    continue
                self._sync_tables()
                (self.paged, self.tokens, self.lengths, self.budget,
                 self.active, toks, n_emit) = decode(
                     self.params["llama"], self.paged, self.tables,
                     self.lengths,
                     self.tokens, self._propose_drafts(), self.budget,
                     self.active, self.lora_pack, self.lora_idx)
                emitted = int(np.asarray(n_emit).sum())
                self.spec_stats["verify_steps"] += 1
                self.spec_stats["tokens_emitted"] += emitted
            elif self.backend == "paged":
                self._ensure_pages()
                if not bool(np.asarray(self.active).any()):
                    continue
                self._sync_tables()
                if self.fsm_vocab is not None:
                    (self.paged, self.tokens, self.lengths, self.budget,
                     self.active, toks, self.fsm_state, _echo) = decode(
                         self.params["llama"], self.paged, self.tables,
                         self.lengths, self.tokens, self.budget,
                         self.active, sub, self.lora_pack, self.lora_idx,
                         self.fsm_allow, self.fsm_trans, self.fsm_state)
                else:
                    (self.paged, self.tokens, self.lengths, self.budget,
                     self.active, toks, _, _echo) = decode(
                         self.params["llama"], self.paged, self.tables,
                         self.lengths, self.tokens, self.budget,
                         self.active, sub, self.lora_pack, self.lora_idx)
            else:
                # NOTE: write_idx advances pool-wide each chunk; capacity
                # bounds total decoded tokens across the pool's lifetime
                # between resets
                if int(self.pool.write_idx) + self.chunk >= self.capacity:
                    self._retire_all("capacity exhausted")
                    continue
                (self.pool, self.tokens, self.lengths, self.budget,
                 self.active, toks) = decode(
                     self.params["llama"], self.pool, self.tokens,
                     self.lengths,
                     self.active, self.budget, sub)
            self._process_round(toks, None, self.active,
                                list(self.slots), t_round)

    def _process_round(self, toks, toks_in, active, snap, t_dispatch):
        """Fetch a dispatched round's results and demux them to clients.

        ``toks_in`` is the round's echo of its pre-round token vector
        (None on the non-pipelined paths): rows admitted asynchronously
        in the round's own iteration read their prefill first token from
        it here — their only host materialization.

        ``snap`` is the slot->request mapping AT DISPATCH TIME: under the
        pipelined loop a snapshot row may have been finalized since
        (finished/cancelled in the previous round's processing, requeued
        by _ensure_pages, or its slot re-admitted to a new request) — the
        ``self.slots[slot] is req`` guard skips those; the round carried
        only -1 sentinel lanes for them (inactive device-side), or, for a
        freed-while-in-flight row, wrote into pages whose next owner's
        prefill import is already enqueued behind this round."""
        toks_np = np.asarray(toks)      # blocks until the round completes
        toks_in_np = None if toks_in is None else np.asarray(toks_in)
        active_np = np.asarray(active)
        self._ev("decode_round",
                 ms=(time.perf_counter() - t_dispatch) * 1e3,
                 rows=sum(1 for r in snap if r is not None))
        self.occupancy["rounds"] += 1
        self.occupancy["active_rows"] += sum(
            1 for r in snap if r is not None)
        for slot, req in enumerate(snap):
            if req is None or self.slots[slot] is not req:
                continue
            if req.pending and toks_in_np is not None:
                self._emit_pending_first(req, int(toks_in_np[slot]))
            if req.cancelled:
                # client stopped mid-stream: retire the row now —
                # the tokens decoded this chunk are discarded, the
                # budget stops burning
                req.out_queue.put(None)
                self.slots[slot] = None
                self.active = self.active.at[slot].set(False)
                if self.backend == "paged":
                    self.alloc.free_row(slot)
                    self._tables_dirty = True
                continue
            row = toks_np[slot]
            # -1 is the device-side "no token" sentinel (see the
            # decode fns) — filtering by value would also drop real
            # pad-id tokens and desync host history from the cache
            row = row[row >= 0]
            if row.size:
                req.out_queue.put(row)
                req.emitted += row.size
                req.generated.extend(int(t) for t in row)
            if not active_np[slot]:
                req.out_queue.put(None)
                self.slots[slot] = None
                if self.backend == "paged":
                    self.alloc.free_row(slot)
                    self._tables_dirty = True

    def _retire_all(self, reason: str):
        """Dense pool write region exhausted: reset it and re-admit every
        in-flight request with prompt+generated-so-far, so clients see an
        uninterrupted stream instead of a silent truncation that looks
        like a normal finish.  Requests that can no longer fit get an
        explicit error chunk (never a clean end-of-stream)."""
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            self.slots[slot] = None
            remaining = req.max_new_tokens - len(req.generated)
            if remaining <= 0:
                req.out_queue.put(None)
                continue
            ids = np.concatenate(
                [np.asarray(req.input_ids).reshape(-1).astype(np.int32),
                 np.asarray(req.generated, np.int32)])[None]
            if not self.fits(ids, req.numtoks, req.pixel_values,
                             req.image_size):
                req.out_queue.put(_StreamError(
                    f"request aborted: {reason} and the continuation "
                    f"prompt no longer fits the pool prefill region"))
                req.out_queue.put(None)
                continue
            cont = _Request(req.rid, ids, req.pixel_values, req.numtoks,
                            remaining, req.lora_id, out_queue=req.out_queue,
                            emitted=req.emitted, image_size=req.image_size)
            self._retry.append(cont)
        self.active = jnp.zeros_like(self.active)
        # reset the pool for a fresh write region
        self.pool = init_kv_cache(self.cfg.llama, self.max_batch,
                                  self.capacity)

"""Autoregressive generation.

TPU-native replacement for the reference's patched HF ``greedy_search``
(reference: llava/model/language_model/generationmixin_patch.py:15-361) and
``LlavaLlamaForCausalLM.generate`` (llava_llama.py:516-627):

* prefill and decode are jitted functions over a fixed-capacity KV cache;
* decoding runs in chunks of ``lax.scan`` steps fully on device (no
  per-token host round trip), with host-side stop-string/EOS checks
  between chunks;
* the ``ver=v2`` combine-logits mode runs the K scale streams as one
  batched forward (scales folded into the batch axis, left-padded to a
  common length) instead of K serial forwards per step;
* greedy is exact argmax (temperature-0 eval parity, docs/Evaluation.md:4);
  sampling supports temperature / top-p.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constants import IMAGE_TOKEN_INDEX
from .kvconfig import parse_kv_from_string, parse_list
from .models.llama import KVCache, embed_tokens, init_kv_cache, llama_forward, lm_head
from .models.llava import LlavaConfig, prepare_multimodal


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 128
    temperature: float = 0.0
    top_p: float = 1.0
    do_sample: bool = False
    eos_token_id: int = 2
    pad_token_id: int = 0
    decode_chunk: int = 32


# ---------------------------------------------------------------------------
# jitted building blocks (cached per static signature)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _prefill_fn(cfg: LlavaConfig, numtoks: int, out_len: int, capacity: int):
    @jax.jit
    def prefill(params, input_ids, pixel_values, attn_mask=None):
        spliced, gating_prob = prepare_multimodal(
            params, cfg, input_ids, pixel_values, numtoks=numtoks,
            attn_mask=attn_mask, out_len=out_len, padding_side="left")
        B, L, _ = spliced.embeds.shape
        cache = init_kv_cache(cfg.llama, B, capacity)
        hidden, cache = llama_forward(
            params["llama"], cfg.llama, spliced.embeds,
            position_ids=spliced.position_ids, attn_valid=spliced.attn_mask,
            cache=cache)
        logits = lm_head(params["llama"], hidden[:, -1:, :])[:, 0]
        lengths = jnp.minimum(spliced.lengths, L)
        return logits, cache, lengths, gating_prob

    return prefill


@lru_cache(maxsize=32)
def _prefill_multi_fn(cfg: LlavaConfig, numtoks: int, n_images: int,
                      out_len: int, capacity: int):
    """Multi-image prefill (B=1): image i's features land at sentinel i
    (see models/llava.prepare_multimodal_multi)."""
    from .models.llava import prepare_multimodal_multi

    @jax.jit
    def prefill(params, input_ids, pixel_values):
        spliced, _ = prepare_multimodal_multi(
            params, cfg, input_ids, pixel_values, numtoks=numtoks,
            out_len=out_len, padding_side="left")
        B, L, _ = spliced.embeds.shape
        cache = init_kv_cache(cfg.llama, B, capacity)
        hidden, cache = llama_forward(
            params["llama"], cfg.llama, spliced.embeds,
            position_ids=spliced.position_ids, attn_valid=spliced.attn_mask,
            cache=cache)
        logits = lm_head(params["llama"], hidden[:, -1:, :])[:, 0]
        lengths = jnp.minimum(spliced.lengths, L)
        return logits, cache, lengths

    return prefill


@lru_cache(maxsize=32)
def _prefill_anyres_fn(cfg: LlavaConfig, numtoks: int, n_tiles: int,
                       image_size: tuple, out_len: int, capacity: int):
    from .models.llava import prepare_multimodal_anyres

    @jax.jit
    def prefill(params, input_ids, pixel_values):
        spliced = prepare_multimodal_anyres(
            params, cfg, input_ids, pixel_values, image_size,
            numtoks=numtoks, out_len=out_len, padding_side="left")
        B, L, _ = spliced.embeds.shape
        cache = init_kv_cache(cfg.llama, B, capacity)
        hidden, cache = llama_forward(
            params["llama"], cfg.llama, spliced.embeds,
            position_ids=spliced.position_ids, attn_valid=spliced.attn_mask,
            cache=cache)
        logits = lm_head(params["llama"], hidden[:, -1:, :])[:, 0]
        lengths = jnp.minimum(spliced.lengths, L)
        return logits, cache, lengths

    return prefill


@lru_cache(maxsize=64)
def _prefill_text_fn(cfg: LlavaConfig, text_len: int, capacity: int):
    @jax.jit
    def prefill(params, input_ids, attn_mask):
        B, T = input_ids.shape
        embeds = embed_tokens(params["llama"], input_ids)
        pos = jnp.maximum(jnp.cumsum(attn_mask.astype(jnp.int32), axis=1) - 1, 0)
        cache = init_kv_cache(cfg.llama, B, capacity)
        hidden, cache = llama_forward(
            params["llama"], cfg.llama, embeds, position_ids=pos,
            attn_valid=attn_mask, cache=cache)
        logits = lm_head(params["llama"], hidden[:, -1:, :])[:, 0]
        lengths = attn_mask.sum(axis=1)
        return logits, cache, lengths

    return prefill


def _select_token(logits, gen_cfg: GenerationConfig, rng):
    """Greedy argmax or temperature/top-p sample from (B, V) logits."""
    if not gen_cfg.do_sample or gen_cfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), rng
    logits = logits / gen_cfg.temperature
    if gen_cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < gen_cfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    rng, sub = jax.random.split(rng)
    return jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32), rng


@lru_cache(maxsize=64)
def _decode_chunk_fn(cfg: LlavaConfig, gen_cfg: GenerationConfig, steps: int):
    # donate the cache: decode updates it in place instead of copying the
    # multi-GB KV buffers every chunk
    @partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache: KVCache, first_token, lengths, finished, rng):
        """Run `steps` greedy/sampled tokens fully on device.

        ``lengths`` is each row's NEXT position; it is carried and returned
        so successive chunks continue the position sequence."""

        def step(carry, _):
            cache, token, lengths, finished, rng = carry
            embeds = embed_tokens(params["llama"], token[:, None])
            pos = lengths[:, None]
            hidden, cache = llama_forward(
                params["llama"], cfg.llama, embeds, position_ids=pos,
                attn_valid=~finished[:, None], cache=cache)
            logits = lm_head(params["llama"], hidden[:, 0:1, :])[:, 0]
            nxt, rng2 = _select_token(logits, gen_cfg, rng)
            nxt = jnp.where(finished, gen_cfg.pad_token_id, nxt)
            finished = finished | (nxt == gen_cfg.eos_token_id)
            return (cache, nxt, lengths + 1, finished, rng2), nxt

        (cache, token, lengths, finished, rng), toks = jax.lax.scan(
            step, (cache, first_token, lengths, finished, rng),
            jnp.arange(steps))
        return cache, token, lengths, finished, toks.T  # (B, steps)

    return decode


# ---------------------------------------------------------------------------
# v2 combine-logits decode (reference: generationmixin_patch.py:175-270)
# ---------------------------------------------------------------------------

def _combine_logits(logits_k: jnp.ndarray, kvs) -> jnp.ndarray:
    """(K, B, V) per-scale logits -> (B, V) combined."""
    if "betas" in kvs:
        betas = jnp.asarray([float(b) for b in parse_list(kvs["betas"])],
                            logits_k.dtype)
        combined = jnp.einsum("k,kbv->bv", betas, logits_k)
        gamma = float(kvs.get("gamma", 0))
        if gamma > 0:
            cutoff = jnp.log(gamma) + combined.max(axis=-1, keepdims=True)
            combined = jnp.where(logits_k[-1] < cutoff, -jnp.inf, combined)
        return combined
    if kvs.get("pickby") == "entropy":
        probs = jax.nn.softmax(logits_k, axis=-1)
        logprobs = jax.nn.log_softmax(logits_k, axis=-1)
        entropy = -jnp.sum(probs * logprobs, axis=-1)          # (K, B)
        best = jnp.argmin(entropy, axis=0)                     # (B,)
        return jnp.take_along_axis(
            logits_k, best[None, :, None], axis=0)[0]
    raise ValueError("v2 spec needs betas=... or pickby=entropy")


@lru_cache(maxsize=16)
def _decode_chunk_combine_fn(cfg: LlavaConfig, gen_cfg: GenerationConfig,
                             steps: int, spec: str, K: int):
    kvs = parse_kv_from_string(spec)

    @partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache: KVCache, first_token, lengths, finished, rng):
        """cache batch axis is K*B (scale-major); one shared token stream.
        ``lengths`` carries each row's next position across chunks."""

        def step(carry, _):
            cache, token, lengths, finished, rng = carry
            B = token.shape[0]
            token_kb = jnp.tile(token, (K,))                   # (K*B,)
            embeds = embed_tokens(params["llama"], token_kb[:, None])
            pos = lengths[:, None]                             # (K*B, 1)
            fin_kb = jnp.tile(finished, (K,))
            hidden, cache = llama_forward(
                params["llama"], cfg.llama, embeds, position_ids=pos,
                attn_valid=~fin_kb[:, None], cache=cache)
            logits = lm_head(params["llama"], hidden[:, 0:1, :])[:, 0]
            logits_k = logits.reshape(K, B, -1)
            combined = _combine_logits(logits_k, kvs)
            nxt, rng2 = _select_token(combined, gen_cfg, rng)
            nxt = jnp.where(finished, gen_cfg.pad_token_id, nxt)
            finished = finished | (nxt == gen_cfg.eos_token_id)
            return (cache, nxt, lengths + 1, finished, rng2), nxt

        (cache, token, lengths, finished, rng), toks = jax.lax.scan(
            step, (cache, first_token, lengths, finished, rng),
            jnp.arange(steps))
        return cache, token, lengths, finished, toks.T

    return decode


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _prefill_dispatch(params, cfg: LlavaConfig, input_ids: jnp.ndarray,
                      pixel_values, image_sizes, attention_mask,
                      numtoks, gen_cfg: GenerationConfig):
    """Shared prompt prefill for the text-only / anyres-tiled /
    one-image-per-row cases — the dispatch both ``generate`` and
    ``beam_generate`` need (multi-image and combine-logits prompts have
    their own paths in ``generate``).  Returns (logits, cache, lengths)
    where logits are the last-position next-token logits."""
    B, T = input_ids.shape
    mask = None if attention_mask is None else \
        jnp.asarray(np.asarray(attention_mask, bool))
    if pixel_values is None:
        text_cap = _round_up(T, 64)
        capacity = text_cap + gen_cfg.max_new_tokens
        pad = text_cap - T
        ids_p = jnp.pad(input_ids, ((0, 0), (pad, 0)))
        m = jnp.ones((B, T), bool) if mask is None else mask
        m = jnp.pad(m, ((0, 0), (pad, 0)))
        return _prefill_text_fn(cfg, text_cap, capacity)(params, ids_p, m)

    pv = np.asarray(pixel_values, np.float32)
    if pv.ndim == 5:
        # anyres: (1, T_tiles, 3, H, W) multi-tile input (LLaVA-NeXT)
        if B != 1:
            raise ValueError("anyres generation supports batch_size=1")
        if mask is not None and not bool(np.asarray(mask).all()):
            raise ValueError("anyres prompts must be unpadded")
        from .models.llava import anyres_token_count

        tiles = jnp.asarray(pv[0])
        n = numtoks if numtoks is not None else cfg.vision.num_patches
        size = tuple(image_sizes[0]) if image_sizes else \
            (cfg.vision.image_size, cfg.vision.image_size)
        n_img = anyres_token_count(cfg, size, int(tiles.shape[0]), n)
        L = _round_up(T - 1 + n_img, 64)
        capacity = L + gen_cfg.max_new_tokens
        return _prefill_anyres_fn(
            cfg, n, int(tiles.shape[0]), size, L, capacity)(
            params, input_ids, tiles)

    n = numtoks if numtoks is not None else cfg.vision.num_patches
    L = _round_up(T - 1 + n, 64)
    capacity = L + gen_cfg.max_new_tokens
    logits, cache, lengths, _ = _prefill_fn(cfg, n, L, capacity)(
        params, input_ids, jnp.asarray(pv), mask)
    return logits, cache, lengths


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def generate(
    params: dict,
    cfg: LlavaConfig,
    input_ids: np.ndarray,                       # (B, T)
    pixel_values: Optional[np.ndarray] = None,   # (B, 3, H, W) or (1, T, 3, H, W)
    *,
    image_sizes=None,                            # [(w, h), ...] for anyres
    attention_mask: Optional[np.ndarray] = None,  # (B, T) for padded batches
    matryoshka_vis_token_scale: Optional[str] = None,
    gen_cfg: GenerationConfig = GenerationConfig(),
    stopping_criteria=None,
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """Generate token ids; returns (B, <=max_new_tokens) generated suffixes.

    Mirrors ``LlavaLlamaForCausalLM.generate`` semantics including the M3
    scale knob: ``ver=v0_numtoks=N`` fixed scale,
    ``ver=v0_numtoks=gateprobargmax`` router-picked scale (batch 1), and
    ``ver=v2_...`` multi-stream logit combination.
    """
    input_ids = jnp.asarray(np.asarray(input_ids, np.int32))
    B, T = input_ids.shape
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    combine = False
    numtoks = None
    if matryoshka_vis_token_scale:
        kvs = parse_kv_from_string(matryoshka_vis_token_scale)
        if kvs["ver"] == "v2":
            combine = True
        elif kvs["numtoks"] == "gateprobargmax":
            # Router argmax picks the scale (inference, batch 1):
            # llava_arch.py:466-471.
            if B != 1:
                raise ValueError("gateprobargmax supports batch_size=1 only")
            gp = np.asarray(gating_probs(params, cfg, pixel_values))
            numtoks = cfg.tokscale_list[int(gp[0].argmax())]
        else:
            numtoks = int(kvs["numtoks"])

    if pixel_values is None or (np.asarray(pixel_values).ndim == 5
                                and not combine):
        logits, cache, lengths = _prefill_dispatch(
            params, cfg, input_ids, pixel_values, image_sizes,
            attention_mask, numtoks, gen_cfg)
        first, rng = _select_token(logits, gen_cfg, rng)
        return _decode_loop(params, cfg, gen_cfg, cache, first, lengths,
                            rng, stopping_criteria)

    pixel_values = jnp.asarray(np.asarray(pixel_values, np.float32))

    # multi-image (B=1): an (M, 3, H, W) stack whose M matches the M image
    # sentinels in the prompt — each image splices at its own sentinel
    # (reference: llava_arch.py ragged loop over images)
    n_sent = int(np.asarray(
        (input_ids == IMAGE_TOKEN_INDEX).sum()))
    if (not combine and pixel_values.ndim == 4 and B == 1
            and pixel_values.shape[0] > 1
            and pixel_values.shape[0] == n_sent):
        n = numtoks if numtoks is not None else cfg.vision.num_patches
        M = int(pixel_values.shape[0])
        L = _round_up(T - M + M * n, 64)
        capacity = L + gen_cfg.max_new_tokens
        logits, cache, lengths = _prefill_multi_fn(cfg, n, M, L, capacity)(
            params, input_ids, pixel_values)
        first, rng = _select_token(logits, gen_cfg, rng)
        return _decode_loop(params, cfg, gen_cfg, cache, first, lengths, rng,
                            stopping_criteria)

    if not combine:
        # left-padded prefill: slots [L - len, L); decode continues at L
        logits, cache, lengths = _prefill_dispatch(
            params, cfg, input_ids, pixel_values, image_sizes,
            attention_mask, numtoks, gen_cfg)
        first, rng = _select_token(logits, gen_cfg, rng)
        return _decode_loop(params, cfg, gen_cfg, cache, first, lengths, rng,
                            stopping_criteria)

    # ---- v2 combine-logits: K parallel scale streams ----
    if pixel_values.ndim == 4 and B == 1 and pixel_values.shape[0] > 1:
        raise ValueError("ver=v2 combine-logits supports one image per "
                         "sample (multi-image prompts use ver=v0)")
    tokscales = [int(x) for x in parse_list(kvs["numtoks"])]
    K = len(tokscales)
    L = _round_up(T - 1 + max(tokscales), 64)
    capacity = L + gen_cfg.max_new_tokens

    logits_list, caches = [], []
    for n in tokscales:
        lg, cache, lengths, _ = _prefill_fn(cfg, n, L, capacity)(
            params, input_ids, pixel_values)
        logits_list.append(lg)
        caches.append(cache)
    # Stack scale streams into the batch axis (scale-major).  KVCache leaves:
    # k/v are (n_layers, B, S, ...) -> concat axis=1; valid/positions are
    # (B, S) -> concat axis=0; write_idx is a shared scalar.
    cache_kb = KVCache(
        k=jnp.concatenate([c.k for c in caches], axis=1),
        v=jnp.concatenate([c.v for c in caches], axis=1),
        valid=jnp.concatenate([c.valid for c in caches], axis=0),
        positions=jnp.concatenate([c.positions for c in caches], axis=0),
        write_idx=caches[0].write_idx,
        # int8 KV: the per-(layer, B, slot, kv-head) dequant scales must
        # ride along or the decode trace dies on cache_ks=None
        k_scale=(jnp.concatenate([c.k_scale for c in caches], axis=1)
                 if caches[0].k_scale is not None else None),
        v_scale=(jnp.concatenate([c.v_scale for c in caches], axis=1)
                 if caches[0].v_scale is not None else None),
    )
    lengths_kb = jnp.tile(lengths, (K,))
    logits_k = jnp.stack(logits_list)                          # (K, B, V)
    combined = _combine_logits(logits_k, kvs)
    first, rng = _select_token(combined, gen_cfg, rng)

    finished = first == gen_cfg.eos_token_id
    out_tokens = [np.asarray(first)[:, None]]
    steps_done = 1
    decode = _decode_chunk_combine_fn(cfg, gen_cfg, gen_cfg.decode_chunk,
                                      matryoshka_vis_token_scale, K)
    token = first
    # Pipelined chunk loop: dispatch chunk i+1 BEFORE fetching chunk i's
    # tokens, so the host<->device round trip (~tunnel RTT per fetch,
    # ~0.4 ms/token at decode_chunk=32 measured on the axon link) rides
    # under chunk i+1's device work instead of serializing with it.  If
    # generation finishes (EOS / stopping criterion) with a chunk in
    # flight, that chunk's device work is wasted — its tokens are at or
    # after the first EOS, which _trim pads out, so output is unchanged.
    pending = None
    while steps_done < gen_cfg.max_new_tokens:
        nsteps = min(gen_cfg.decode_chunk, gen_cfg.max_new_tokens - steps_done)
        if nsteps < gen_cfg.decode_chunk:
            decode = _decode_chunk_combine_fn(
                cfg, gen_cfg, nsteps, matryoshka_vis_token_scale, K)
        rng, sub = jax.random.split(rng)
        cache_kb, token, lengths_kb, finished, toks = decode(
            params, cache_kb, token, lengths_kb, finished, sub)
        steps_done += nsteps
        if pending is not None:
            prev_toks, prev_fin = pending
            out_tokens.append(np.asarray(prev_toks))
            if bool(np.asarray(prev_fin).all()):
                pending = None
                break
            if stopping_criteria is not None:
                flat = np.concatenate(out_tokens, axis=1)
                if stopping_criteria(list(flat[0])):
                    pending = None
                    break
        pending = (toks, finished)
    if pending is not None:
        out_tokens.append(np.asarray(pending[0]))
    return _trim(np.concatenate(out_tokens, axis=1), gen_cfg)


# ---------------------------------------------------------------------------
# beam search (reference: the HF generate(num_beams=N) path the eval
# scripts expose, e.g. llava/eval/model_vqa.py --num-beams / run_llava.py;
# the reference delegates to transformers' BeamSearchScorer)
# ---------------------------------------------------------------------------

def _reorder_cache(cache: KVCache, parent: jnp.ndarray) -> KVCache:
    """Gather beam rows after a top-k step.  k/v (+ int8 scales) carry the
    beam axis at 1, valid/positions at 0; write_idx is shared."""
    return KVCache(
        k=cache.k[:, parent], v=cache.v[:, parent],
        valid=cache.valid[parent], positions=cache.positions[parent],
        write_idx=cache.write_idx,
        k_scale=None if cache.k_scale is None else cache.k_scale[:, parent],
        v_scale=None if cache.v_scale is None else cache.v_scale[:, parent])


@lru_cache(maxsize=16)
def _beam_decode_fn(cfg: LlavaConfig, gen_cfg: GenerationConfig,
                    num_beams: int, steps: int, length_penalty: float):
    """Whole-beam-search-on-device decode with HF hypothesis banking:
    each step takes the top ``2*num_beams`` flat candidates; eos'd
    candidates ranked inside the top ``num_beams`` move to a fixed-size
    hypothesis bank (replace-worst, scores normalized by full sequence
    length at banking time, HF BeamHypotheses.add), and the live slots
    refill with the best non-eos candidates — exploration never shrinks.
    A ``done`` flag mirrors HF's early_stopping=False criterion (bank
    full and the best attainable live score cannot beat the worst banked
    hypothesis); once set, later banking stops, so extra scan steps
    cannot change the result.  The token history is carried (and
    parent-gathered) inside the scan — no host-side backtrace."""

    @partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache: KVCache, token, lengths, scores,
               bank_norm0, bank_seqs0, done0):
        pad_t = gen_cfg.pad_token_id
        eos_t = gen_cfg.eos_token_id
        lp = length_penalty
        k2 = 2 * num_beams

        def step(carry, i):
            (cache, token, lengths, scores, hist, bank_norm, bank_seqs,
             done) = carry
            embeds = embed_tokens(params["llama"], token[:, None])
            hidden, cache = llama_forward(
                params["llama"], cfg.llama, embeds,
                position_ids=lengths[:, None],
                attn_valid=jnp.ones_like(lengths, bool)[:, None],
                cache=cache)
            logits = lm_head(params["llama"], hidden[:, 0:1, :])[:, 0]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            V = logp.shape[-1]
            cand_scores, cand_idx = jax.lax.top_k(
                (scores[:, None] + logp).reshape(-1), k2)
            cand_parent = (cand_idx // V).astype(jnp.int32)
            cand_tok = (cand_idx % V).astype(jnp.int32)
            is_eos = cand_tok == eos_t

            # ---- bank eos candidates ranked inside the top num_beams
            # (HF: beam_token_rank < group_size), replace-worst.  HF's
            # BeamHypotheses.add normalizes by GENERATED length counting
            # the eos: generated_len = cur_len - prompt_len = i + 2 ----
            add_len = jnp.float32(i + 2)
            for r in range(num_beams):
                norm_r = cand_scores[r] / add_len ** lp
                seq_r = hist[cand_parent[r]].at[i + 1].set(eos_t)
                worst = jnp.argmin(bank_norm)
                take = is_eos[r] & ~done & (norm_r > bank_norm[worst])
                bank_norm = jnp.where(take,
                                      bank_norm.at[worst].set(norm_r),
                                      bank_norm)
                bank_seqs = jnp.where(take,
                                      bank_seqs.at[worst].set(seq_r),
                                      bank_seqs)

            # ---- refill live slots with the best non-eos candidates
            # (each beam offers at most one eos among its top-2N entries,
            # so >= num_beams non-eos candidates always exist) ----
            order = jnp.cumsum(~is_eos) - 1
            slot = jnp.where(~is_eos, order, k2).astype(jnp.int32)
            new_scores = jnp.full((num_beams,), -jnp.inf
                                  ).at[slot].set(cand_scores, mode="drop")
            parent = jnp.zeros((num_beams,), jnp.int32
                               ).at[slot].set(cand_parent, mode="drop")
            nxt = jnp.zeros((num_beams,), jnp.int32
                            ).at[slot].set(cand_tok, mode="drop")

            # HF is_done (early_stopping=False): best attainable score —
            # best candidate sum over generated length — can no longer
            # beat the worst banked hypothesis
            bank_full = jnp.all(bank_norm > -jnp.inf)
            done = done | (bank_full
                           & (jnp.min(bank_norm)
                              >= cand_scores[0] / add_len ** lp))

            hist = hist[parent].at[:, i + 1].set(nxt)
            cache = _reorder_cache(cache, parent)
            return (cache, nxt, lengths + 1, new_scores, hist, bank_norm,
                    bank_seqs, done), None

        hist0 = jnp.full((num_beams, steps + 1), pad_t,
                         jnp.int32).at[:, 0].set(token)
        (cache, token, lengths, scores, hist, bank_norm, bank_seqs,
         done), _ = jax.lax.scan(
            step, (cache, token, lengths, scores, hist0, bank_norm0,
                   bank_seqs0, done0), jnp.arange(steps))
        return scores, hist, bank_norm, bank_seqs, done

    return decode


def beam_generate(
    params: dict,
    cfg: LlavaConfig,
    input_ids: np.ndarray,                       # (1, T)
    pixel_values: Optional[np.ndarray] = None,   # (1, 3, H, W) | (1, T, 3, H, W)
    *,
    image_sizes=None,                            # [(w, h)] for anyres
    attention_mask: Optional[np.ndarray] = None,  # (1, T) for padded rows
    matryoshka_vis_token_scale: Optional[str] = None,
    num_beams: int = 3,
    gen_cfg: GenerationConfig = GenerationConfig(),
    length_penalty: float = 1.0,
    stopping_criteria=None,
) -> np.ndarray:
    """Beam-search decode, batch 1 (the reference surface: HF
    ``generate(num_beams=N)`` behind ``--num-beams`` in the eval scripts).
    Deterministic; returns the best hypothesis's (1, <=max_new_tokens)
    suffix.  Scores are summed log-probs normalized by
    ``len ** length_penalty`` (HF convention).  The whole search — forward,
    flat top-k, beam/KV reorder — runs on device; the per-step cache
    gather is the cost of beam search everywhere and is O(beams x cache)
    HBM traffic."""
    input_ids = jnp.asarray(np.asarray(input_ids, np.int32))
    B, T = input_ids.shape
    if B != 1:
        raise ValueError("beam search supports batch_size=1")
    numtoks = None
    if matryoshka_vis_token_scale:
        kvs = parse_kv_from_string(matryoshka_vis_token_scale)
        if kvs.get("ver") == "v2":
            raise ValueError("ver=v2 combine-logits does not compose with "
                             "beam search; use ver=v0")
        if kvs.get("numtoks") == "gateprobargmax":
            gp = np.asarray(gating_probs(params, cfg, pixel_values))
            numtoks = cfg.tokscale_list[int(gp[0].argmax())]
        else:
            numtoks = int(kvs["numtoks"])

    if pixel_values is not None:
        pv = np.asarray(pixel_values)
        if pv.ndim == 4 and pv.shape[0] != 1:
            raise ValueError("beam search supports one image per prompt")
    logits, cache, lengths = _prefill_dispatch(
        params, cfg, input_ids, pixel_values, image_sizes, attention_mask,
        numtoks, gen_cfg)

    # seed with the same 2N-candidate protocol as the scan steps: eos
    # candidates ranked inside the top num_beams go straight to the
    # hypothesis bank (generated_len 1 — HF counts the eos), live slots
    # take the best non-eos candidates
    steps = gen_cfg.max_new_tokens - 1
    logp0 = np.asarray(
        jax.nn.log_softmax(logits[0].astype(jnp.float32)), np.float32)
    seed_order = np.argsort(-logp0)[: 2 * num_beams]
    bank_norm0 = np.full((num_beams,), -np.inf, np.float32)
    bank_seqs0 = np.full((num_beams, max(steps, 0) + 1),
                         gen_cfg.pad_token_id, np.int32)
    live_scores, live_toks = [], []
    for r, t in enumerate(seed_order):
        if int(t) == gen_cfg.eos_token_id:
            if r < num_beams:
                worst = int(bank_norm0.argmin())
                if logp0[t] > bank_norm0[worst]:
                    bank_norm0[worst] = logp0[t]
                    bank_seqs0[worst, 0] = gen_cfg.eos_token_id
            continue
        if len(live_toks) < num_beams:
            live_scores.append(logp0[t])
            live_toks.append(int(t))
    done0 = bool(np.all(bank_norm0 > -np.inf)
                 and bank_norm0.min() >= logp0[seed_order[0]])
    scores0 = jnp.asarray(np.asarray(live_scores, np.float32))
    toks0 = jnp.asarray(np.asarray(live_toks, np.int32))
    cache_b = KVCache(
        k=jnp.repeat(cache.k, num_beams, axis=1),
        v=jnp.repeat(cache.v, num_beams, axis=1),
        valid=jnp.repeat(cache.valid, num_beams, axis=0),
        positions=jnp.repeat(cache.positions, num_beams, axis=0),
        write_idx=cache.write_idx,
        k_scale=None if cache.k_scale is None
        else jnp.repeat(cache.k_scale, num_beams, axis=1),
        v_scale=None if cache.v_scale is None
        else jnp.repeat(cache.v_scale, num_beams, axis=1))
    lengths_b = jnp.repeat(lengths, num_beams, axis=0)

    if steps > 0:
        decode = _beam_decode_fn(cfg, gen_cfg, num_beams, steps,
                                 length_penalty)
        scores, hist, bank_norm, bank_seqs, done = decode(
            params, cache_b, toks0, lengths_b, scores0,
            jnp.asarray(bank_norm0), jnp.asarray(bank_seqs0),
            jnp.asarray(done0))
        scores = np.asarray(scores, np.float64)
        seqs = np.asarray(hist)
        bank_norm = np.asarray(bank_norm, np.float64)
        bank_seqs = np.asarray(bank_seqs)
        done = bool(np.asarray(done))
    else:
        scores = np.asarray(scores0, np.float64)
        seqs = np.asarray(toks0)[:, None]
        bank_norm, bank_seqs, done = bank_norm0, bank_seqs0, done0

    # HF finalize: live beams join the bank only when the search did not
    # early-stop, normalized by their generated length (steps + 1)
    live_norm = scores / float(steps + 1) ** length_penalty
    if done:
        cand_norm, cand_seqs = bank_norm, bank_seqs
    else:
        cand_norm = np.concatenate([bank_norm, live_norm])
        cand_seqs = np.concatenate([bank_seqs, seqs], axis=0)
    best = cand_seqs[int(cand_norm.argmax())][None]
    best = _trim(best, gen_cfg)
    if stopping_criteria is not None:
        # post-hoc trim at the earliest prefix the criteria accepts (the
        # reference halts the whole search there; exploring the full
        # horizon first can only change near-tie hypothesis picks)
        row = list(best[0])
        for i in range(1, len(row) + 1):
            if stopping_criteria(row[:i]):
                best = best[:, :i]
                break
    return best


def chunked_prefill(params, cfg: LlavaConfig, embeds: jnp.ndarray,
                    position_ids: jnp.ndarray, attn_valid: jnp.ndarray,
                    capacity: int, chunk: int = 512):
    """Prefill a long prompt in fixed-size chunks against the cache.

    Bounds prefill activation memory to O(chunk) instead of O(prompt) for
    very long contexts; each chunk's cache-slot offset is static so the
    flash kernel's index-based causality stays exact.  Returns
    (last_logits, cache).
    """
    from .models.llama import init_kv_cache, llama_forward, lm_head

    B, S, D = embeds.shape
    assert S % chunk == 0, (S, chunk)
    cache = init_kv_cache(cfg.llama, B, capacity)
    hidden = None
    for i in range(S // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        hidden, cache = llama_forward(
            params["llama"], cfg.llama, embeds[:, sl],
            position_ids=position_ids[:, sl], attn_valid=attn_valid[:, sl],
            cache=cache, q_index_offset=i * chunk)
    logits = lm_head(params["llama"], hidden[:, -1:, :])[:, 0]
    return logits, cache


@lru_cache(maxsize=32)
def _verify_fn(cfg: LlavaConfig, k: int):
    """Sq=k+1 greedy verification step against the cache (speculative
    decoding): appends the k+1 tokens' K/V and returns each position's
    greedy next token.  Uses position-based reference attention — the
    write offset is dynamic, which the flash kernel's static index-based
    causality can't express."""
    import dataclasses as _dc

    ref_llama = _dc.replace(cfg.llama, attn_impl="reference")

    @jax.jit
    def verify(params, cache: KVCache, tokens, lengths):
        embeds = embed_tokens(params["llama"], tokens)        # (1, k+1, D)
        pos = lengths[:, None] + jnp.arange(k + 1)[None]
        hidden, cache = llama_forward(
            params["llama"], ref_llama, embeds, position_ids=pos,
            attn_valid=jnp.ones(tokens.shape, bool), cache=cache)
        logits = lm_head(params["llama"], hidden)
        return jnp.argmax(logits, -1).astype(jnp.int32), cache

    return verify


@lru_cache(maxsize=8)
def _rewind_fn(k: int):
    """Invalidate the rejected tail of a verify step's cache writes and
    move write_idx back so the next step overwrites them."""

    @jax.jit
    def rewind(cache: KVCache, n_acc):
        w0 = cache.write_idx - (k + 1)
        idx = jnp.arange(cache.valid.shape[1])[None]
        drop = (idx >= w0 + n_acc + 1) & (idx < w0 + k + 1)
        return cache._replace(valid=cache.valid & ~drop,
                              write_idx=w0 + n_acc + 1)

    return rewind


@lru_cache(maxsize=16)
def _pld_loop_fn(cfg: LlavaConfig, k: int, ngram: int, buf_len: int,
                 max_new: int, eos: int, pad: int):
    """Fully on-device prompt-lookup decoding loop (one dispatch per
    generation): propose k tokens by matching the trailing n-gram inside
    the token buffer, verify them with one Sq=k+1 forward, accept the
    greedy-consistent prefix, rewind the cache tail, repeat under
    ``lax.while_loop``.  No host round-trips — on a tunneled TPU a host
    sync per step costs more than the verify itself."""
    import dataclasses as _dc

    ref_llama = _dc.replace(cfg.llama, attn_impl="reference")

    def propose(buf, n_buf, cur):
        pat = jax.lax.dynamic_slice(buf, (0, n_buf - ngram), (1, ngram))[0]
        L = buf.shape[1]
        m = jnp.ones((L - ngram + 1,), bool)
        for j in range(ngram):          # ngram is small and static
            m = m & (buf[0, j: L - ngram + 1 + j] == pat[j])
        idx = jnp.arange(L - ngram + 1)
        m = m & (idx < n_buf - ngram)   # strictly earlier occurrence
        best = jnp.max(jnp.where(m, idx, -1))
        start = jnp.clip(best + ngram, 0, L - k)
        cont = jax.lax.dynamic_slice(buf, (0, start), (1, k))[0]
        return jnp.where(m.any(), cont, jnp.full((k,), cur, jnp.int32))

    def verify(params, cache, tokens, seq_len):
        embeds = embed_tokens(params["llama"], tokens[None])
        pos = (seq_len + jnp.arange(k + 1))[None]
        hidden, cache = llama_forward(
            params["llama"], ref_llama, embeds, position_ids=pos,
            attn_valid=jnp.ones((1, k + 1), bool), cache=cache)
        logits = lm_head(params["llama"], hidden)
        return jnp.argmax(logits, -1)[0].astype(jnp.int32), cache

    @jax.jit
    def run(params, cache, buf, n_buf, seq_len, cur):
        def cond(st):
            return ~st[5] & (st[4] < max_new)

        def body(st):
            cache, buf, n_buf, seq_len, emitted, finished, cur = st
            draft = propose(buf, n_buf, cur)
            tokens = jnp.concatenate([cur[None], draft])
            greedy, cache = verify(params, cache, tokens, seq_len)
            match = draft == greedy[:k]
            n_acc = jnp.where(match.all(), k,
                              jnp.argmax(~match)).astype(jnp.int32)
            j = jnp.arange(k + 1)
            is_eos = greedy == eos
            eos_before = jnp.cumsum(is_eos) - is_eos.astype(jnp.int32)
            keep = (j <= n_acc) & (eos_before == 0) & (emitted + j < max_new)
            n_emit = keep.sum().astype(jnp.int32)
            # vanilla convention: the eos itself is masked to pad
            out_vals = jnp.where(keep & ~is_eos, greedy, pad).astype(jnp.int32)
            buf = jax.lax.dynamic_update_slice(buf, out_vals[None],
                                               (0, n_buf))
            # rewind: keep the n_emit accepted K/V entries
            w0 = cache.write_idx - (k + 1)
            idx = jnp.arange(cache.valid.shape[1])[None]
            drop = (idx >= w0 + n_emit) & (idx < w0 + k + 1)
            cache = cache._replace(valid=cache.valid & ~drop,
                                   write_idx=w0 + n_emit)
            finished = finished | (keep & is_eos).any() | \
                (emitted + n_emit >= max_new) | (n_emit == 0)
            cur = greedy[jnp.clip(n_emit - 1, 0, k)]
            return (cache, buf, n_buf + n_emit, seq_len + n_emit,
                    emitted + n_emit, finished, cur)

        st = (cache, buf, n_buf, seq_len, jnp.zeros((), jnp.int32),
              jnp.zeros((), bool), cur)
        st = jax.lax.while_loop(cond, body, st)
        return st[1], st[4]    # buffer, emitted count

    return run


def _ngram_propose(ids, k: int, ngram: int):
    """Prompt-lookup draft: continue the most recent earlier occurrence of
    the trailing n-gram; pad by repeating when the match runs short."""
    if len(ids) <= ngram:
        return [int(ids[-1])] * k
    pat = list(ids[-ngram:])
    for s in range(len(ids) - ngram - 1, -1, -1):
        if list(ids[s:s + ngram]) == pat:
            cont = [int(x) for x in ids[s + ngram: s + ngram + k]]
            if cont:
                return (cont + [cont[-1]] * k)[:k]
    return [int(ids[-1])] * k


def speculative_generate(
    params: dict,
    cfg: LlavaConfig,
    input_ids: np.ndarray,                       # (1, T)
    pixel_values: Optional[np.ndarray] = None,   # (1, 3, H, W)
    *,
    matryoshka_vis_token_scale: Optional[str] = None,
    gen_cfg: GenerationConfig = GenerationConfig(),
    k: int = 8,
    ngram: int = 3,
    propose_fn=None,                             # (ids, k, ngram) -> [k ids]
) -> np.ndarray:
    """Greedy generation with prompt-lookup speculative decoding.

    Beyond-reference serving accelerator: drafts come from matching the
    trailing n-gram against the prompt + generated text (no draft model),
    and one Sq=k+1 forward verifies all k drafts — on TPU that step costs
    ~1.4x a single-token step (weights dominate HBM traffic), so
    throughput approaches (accepted+1)/1.4 per verify on copy-heavy text.
    The whole loop runs on device under ``lax.while_loop`` (one dispatch
    per generation; a host sync per step would cost more than the verify).

    Notes measured on one v5e with the 7B model:

    * pair with int8 weights (the serving config): at bf16 XLA hoists ~3GB
      of transposed stacked-weight copies for the Sq>1 GEMMs, which OOMs a
      16GB chip next to 13.5GB of weights;
    * outputs are greedy and self-consistent, and bit-identical to
      :func:`generate` in f32; under bf16 the Sq=k+1 matmul tiling can
      flip argmax on near-tied logits.
    """
    input_ids = np.asarray(input_ids, np.int32)
    B, T = input_ids.shape
    if B != 1:
        raise ValueError("speculative decoding supports batch_size=1")
    if gen_cfg.do_sample and gen_cfg.temperature > 0:
        raise ValueError("speculative decoding is greedy-only")

    numtoks = None
    if matryoshka_vis_token_scale:
        kvs = parse_kv_from_string(matryoshka_vis_token_scale)
        if kvs["ver"] != "v0":
            raise ValueError("speculative decoding supports ver=v0 scales")
        if kvs["numtoks"] == "gateprobargmax":
            gp = np.asarray(gating_probs(params, cfg, pixel_values))
            numtoks = cfg.tokscale_list[int(gp[0].argmax())]
        else:
            numtoks = int(kvs["numtoks"])

    max_new = gen_cfg.max_new_tokens
    if pixel_values is None:
        text_cap = _round_up(T, 64)
        capacity = text_cap + max_new + k + 1
        pad = text_cap - T
        ids_p = jnp.pad(jnp.asarray(input_ids), ((0, 0), (pad, 0)))
        mask = jnp.pad(jnp.ones((1, T), bool), ((0, 0), (pad, 0)))
        logits, cache, lengths = _prefill_text_fn(cfg, text_cap, capacity)(
            params, ids_p, mask)
    else:
        n = numtoks if numtoks is not None else cfg.vision.num_patches
        L = _round_up(T - 1 + n, 64)
        capacity = L + max_new + k + 1
        logits, cache, lengths, _ = _prefill_fn(cfg, n, L, capacity)(
            params, jnp.asarray(input_ids),
            jnp.asarray(np.asarray(pixel_values, np.float32)))

    eos = gen_cfg.eos_token_id
    first = int(np.asarray(jnp.argmax(logits, -1))[0])
    out = [first]
    ids_all = [int(x) for x in input_ids[0]] + [first]
    cur = first

    if first == eos or max_new <= 1:
        return np.asarray([[first]], np.int32)

    if propose_fn is None:
        # fully on-device loop: one dispatch for the whole generation
        buf_len = T + max_new + k + ngram + 1
        buf = np.full((1, buf_len), gen_cfg.pad_token_id, np.int32)
        buf[0, :T] = input_ids[0]
        buf[0, T] = first
        run = _pld_loop_fn(cfg, k, ngram, buf_len, max_new - 1, eos,
                           gen_cfg.pad_token_id)
        buf_out, n_emitted = run(params, cache, jnp.asarray(buf),
                                 jnp.asarray(T + 1, jnp.int32),
                                 lengths[0].astype(jnp.int32),
                                 jnp.asarray(first, jnp.int32))
        toks = np.asarray(buf_out)[0, T: T + max_new]
        return toks[None]

    verify = _verify_fn(cfg, k)
    rewind = _rewind_fn(k)
    propose = propose_fn
    while len(out) < max_new and cur != eos:
        draft = propose(ids_all, k, ngram)
        tokens = jnp.asarray([[cur] + draft], jnp.int32)
        greedy, cache = verify(params, cache, tokens, lengths)
        g = np.asarray(greedy[0])                    # (k+1,)
        n_acc = 0
        while n_acc < k and draft[n_acc] == int(g[n_acc]):
            n_acc += 1
        emitted = [int(x) for x in draft[:n_acc]] + [int(g[n_acc])]
        if eos in emitted:                           # stop at (and keep) eos
            emitted = emitted[: emitted.index(eos) + 1]
            n_acc = len(emitted) - 1
        if len(out) + len(emitted) > max_new:        # budget clip
            emitted = emitted[: max_new - len(out)]
            n_acc = max(len(emitted) - 1, 0)
        cache = rewind(cache, jnp.asarray(n_acc, jnp.int32))
        lengths = lengths + n_acc + 1
        out.extend(emitted)
        ids_all.extend(emitted)
        if not emitted:
            break
        cur = emitted[-1]

    return np.asarray([out], np.int32)


def stream_generate(
    params: dict,
    cfg: LlavaConfig,
    input_ids: np.ndarray,
    pixel_values: Optional[np.ndarray] = None,
    *,
    image_sizes=None,
    matryoshka_vis_token_scale: Optional[str] = None,
    gen_cfg: GenerationConfig = GenerationConfig(),
    rng: Optional[jax.Array] = None,
):
    """Generator yielding the cumulative generated ids after every decode
    chunk — the TPU equivalent of HF's TextIteratorStreamer thread in the
    reference worker (reference: llava/serve/model_worker.py:179-189).

    anyres multi-tile input (pixel_values ``(1, T_tiles, 3, H, W)`` plus
    ``image_sizes=[(w, h)]``) prefills through the anyres merge path and
    then streams through the same decode loop."""
    input_ids = jnp.asarray(np.asarray(input_ids, np.int32))
    B, T = input_ids.shape
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    numtoks = None
    if matryoshka_vis_token_scale:
        kvs = parse_kv_from_string(matryoshka_vis_token_scale)
        if kvs["ver"] == "v2":
            # stream chunks through the blocking path (combine mode)
            yield generate(params, cfg, np.asarray(input_ids), pixel_values,
                           matryoshka_vis_token_scale=matryoshka_vis_token_scale,
                           gen_cfg=gen_cfg, rng=rng)
            return
        if kvs["numtoks"] == "gateprobargmax":
            gp = np.asarray(gating_probs(params, cfg, pixel_values))
            numtoks = cfg.tokscale_list[int(gp[0].argmax())]
        else:
            numtoks = int(kvs["numtoks"])

    if pixel_values is None:
        text_cap = _round_up(T, 64)
        capacity = text_cap + gen_cfg.max_new_tokens
        pad = text_cap - T
        ids_p = jnp.pad(input_ids, ((0, 0), (pad, 0)))
        mask = jnp.pad(jnp.ones((B, T), bool), ((0, 0), (pad, 0)))
        logits, cache, lengths = _prefill_text_fn(cfg, text_cap, capacity)(
            params, ids_p, mask)
    else:
        pixel_values = jnp.asarray(np.asarray(pixel_values, np.float32))
        n = numtoks if numtoks is not None else cfg.vision.num_patches
        if pixel_values.ndim == 5:       # anyres multi-tile (LLaVA-NeXT)
            from .models.llava import anyres_token_count

            if B != 1:
                raise ValueError("anyres streaming supports batch_size=1")
            tiles = pixel_values[0]
            size = tuple(image_sizes[0]) if image_sizes else \
                (cfg.vision.image_size, cfg.vision.image_size)
            n_img = anyres_token_count(cfg, size, int(tiles.shape[0]), n)
            L = _round_up(T - 1 + n_img, 64)
            capacity = L + gen_cfg.max_new_tokens
            logits, cache, lengths = _prefill_anyres_fn(
                cfg, n, int(tiles.shape[0]), size, L, capacity)(
                params, input_ids, tiles)
        elif (pixel_values.ndim == 4 and B == 1
              and pixel_values.shape[0] > 1
              and int(np.asarray((input_ids == IMAGE_TOKEN_INDEX).sum()))
              == pixel_values.shape[0]):
            # multi-image prompt: image i splices at sentinel i
            M = int(pixel_values.shape[0])
            L = _round_up(T - M + M * n, 64)
            capacity = L + gen_cfg.max_new_tokens
            logits, cache, lengths = _prefill_multi_fn(
                cfg, n, M, L, capacity)(params, input_ids, pixel_values)
        else:
            L = _round_up(T - 1 + n, 64)
            capacity = L + gen_cfg.max_new_tokens
            logits, cache, lengths, _ = _prefill_fn(cfg, n, L, capacity)(
                params, input_ids, pixel_values)

    first, rng = _select_token(logits, gen_cfg, rng)
    finished = first == gen_cfg.eos_token_id
    out_tokens = [np.asarray(first)[:, None]]
    yield _trim(np.concatenate(out_tokens, axis=1), gen_cfg)
    steps_done = 1
    token = first
    # Pipelined: dispatch chunk i+1 before fetching/yielding chunk i (see
    # the combine-path loop in generate()).  The yield of chunk i lands at
    # the same wall time (the fetch is unchanged); completion time drops
    # by ~one tunnel round trip per chunk.
    pending = None
    while steps_done < gen_cfg.max_new_tokens:
        nsteps = min(gen_cfg.decode_chunk, gen_cfg.max_new_tokens - steps_done)
        decode = _decode_chunk_fn(cfg, gen_cfg, nsteps)
        rng, sub = jax.random.split(rng)
        cache, token, lengths, finished, toks = decode(
            params, cache, token, lengths, finished, sub)
        steps_done += nsteps
        if pending is not None:
            prev_toks, prev_fin = pending
            out_tokens.append(np.asarray(prev_toks))
            yield _trim(np.concatenate(out_tokens, axis=1), gen_cfg)
            if bool(np.asarray(prev_fin).all()):
                pending = None
                break
        pending = (toks, finished)
    if pending is not None:
        out_tokens.append(np.asarray(pending[0]))
        yield _trim(np.concatenate(out_tokens, axis=1), gen_cfg)


def _decode_loop(params, cfg, gen_cfg, cache, first, lengths, rng,
                 stopping_criteria):
    finished = first == gen_cfg.eos_token_id
    out_tokens = [np.asarray(first)[:, None]]
    steps_done = 1
    token = first
    # Pipelined: dispatch chunk i+1 before fetching chunk i (see the
    # combine-path loop in generate() for the full rationale).
    pending = None
    while steps_done < gen_cfg.max_new_tokens:
        nsteps = min(gen_cfg.decode_chunk, gen_cfg.max_new_tokens - steps_done)
        decode = _decode_chunk_fn(cfg, gen_cfg, nsteps)
        rng, sub = jax.random.split(rng)
        cache, token, lengths, finished, toks = decode(
            params, cache, token, lengths, finished, sub)
        steps_done += nsteps
        if pending is not None:
            prev_toks, prev_fin = pending
            out_tokens.append(np.asarray(prev_toks))
            if bool(np.asarray(prev_fin).all()):
                pending = None
                break
            if stopping_criteria is not None:
                flat = np.concatenate(out_tokens, axis=1)
                if stopping_criteria(list(flat[0])):
                    pending = None
                    break
        pending = (toks, finished)
    if pending is not None:
        out_tokens.append(np.asarray(pending[0]))
    return _trim(np.concatenate(out_tokens, axis=1), gen_cfg)


def _trim(tokens: np.ndarray, gen_cfg: GenerationConfig) -> np.ndarray:
    """Cut everything at/after the first EOS per row (pad after)."""
    out = tokens.copy()
    for b in range(out.shape[0]):
        eos = np.where(out[b] == gen_cfg.eos_token_id)[0]
        if eos.size:
            out[b, eos[0]:] = gen_cfg.pad_token_id
    return out


@lru_cache(maxsize=8)
def _gating_fn(cfg: LlavaConfig):
    @jax.jit
    def run(params, pixel_values):
        from .models.llava import encode_images, router_forward

        outs = encode_images(params, cfg, pixel_values)
        return router_forward(params, cfg, outs)

    return run


def gating_probs(params, cfg: LlavaConfig, pixel_values) -> jnp.ndarray:
    """(B, K) router probabilities for scale selection."""
    return _gating_fn(cfg)(params, jnp.asarray(np.asarray(pixel_values, np.float32)))

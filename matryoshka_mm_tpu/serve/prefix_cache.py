"""Prefix caching for the paged serving pool (radix-lite).

The SGLang backend the reference can serve through gets its throughput
from two mechanisms: continuous batching (serve/batching.py) and
RadixAttention — reusing KV pages across requests that share a prompt
prefix.  This module is the TPU-native analog of the latter:

* ``PrefixIndex`` — chain hashes of page-aligned chunks of the *spliced*
  token-key sequence (text ids; image spans keyed by image-content hash ×
  scale) → physical page id.  A lookup walks consecutive chunks from the
  root, so any hit is a complete, position-aligned KV prefix.
* ``RefcountAllocator`` — pages carry refcounts so one physical page can
  back many rows' tables; retired pages that the index still references
  are retained ("cached") and flushed wholesale under allocation
  pressure.
* ``suffix_prefill`` — given H cached pages, prefills only the remaining
  (pure-text) suffix: the prefix KV is scattered into a fresh dense
  cache, ``llama_forward`` appends the suffix at ``write_idx = H*page``
  with static ``q_index_offset`` (flash-kernel causality stays exact),
  and only the new pages are imported back into the pool.

Shared pages are never written: a row's write cursor starts at
``row_len`` which lies beyond the shared region, and the decode scatter
targets the row's own fresh pages.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .paged_cache import PageAllocator, PagedKVCache


# ---------------------------------------------------------------------------
# key sequence + chain hashing
# ---------------------------------------------------------------------------

def image_pseudo_ids(image_bytes_hash: int, numtoks: int) -> np.ndarray:
    """Stable per-position pseudo token ids for an image's feature span."""
    base = np.int64(image_bytes_hash & 0x7FFFFFFFFFFF)
    return base + np.arange(numtoks, dtype=np.int64)


def build_key_seq(input_ids: np.ndarray, numtoks: Optional[int],
                  image_hash: Optional[int], image_token_index: int
                  ) -> Tuple[np.ndarray, int]:
    """Spliced token-key sequence + index where pure text resumes.

    Returns (key_seq, text_resume): key_seq[i] uniquely keys the content
    of spliced position i; positions < text_resume may be image features
    (a cached prefix must cover them before suffix prefill applies)."""
    ids = np.asarray(input_ids).reshape(-1).astype(np.int64)
    img_pos = np.nonzero(ids == image_token_index)[0]
    if img_pos.size == 0 or numtoks is None:
        return ids, 0
    p = int(img_pos[0])
    key = np.concatenate([ids[:p], image_pseudo_ids(image_hash or 0, numtoks),
                          ids[p + 1:]])
    return key, p + numtoks


def chain_hashes(key_seq: np.ndarray, page_size: int,
                 salt: str = "") -> List[bytes]:
    """hash_i = H(hash_{i-1} || chunk_i) for each FULL page chunk.

    ``salt`` roots the chain (e.g. a LoRA adapter name): pages produced
    under different adapters hold different KV and must never match."""
    out, h = [], salt.encode() if salt else b""
    n_full = len(key_seq) // page_size
    for i in range(n_full):
        chunk = key_seq[i * page_size:(i + 1) * page_size]
        h = hashlib.blake2b(h + chunk.tobytes(), digest_size=16).digest()
        out.append(h)
    return out


class PrefixIndex:
    """chain hash -> physical page id, with LRU recency."""

    def __init__(self):
        self.pages: "OrderedDict[bytes, int]" = OrderedDict()

    def lookup(self, hashes: Sequence[bytes]) -> List[int]:
        """Longest consecutive run of hits from the root; touches LRU."""
        hit = []
        for h in hashes:
            if h not in self.pages:
                break
            self.pages.move_to_end(h)
            hit.append(self.pages[h])
        return hit

    def register(self, hashes: Sequence[bytes], page_ids: Sequence[int]):
        for h, p in zip(hashes, page_ids):
            self.pages[h] = p
            self.pages.move_to_end(h)

    def drop_pages(self, page_ids) -> None:
        dead = set(page_ids)
        for h in [h for h, p in self.pages.items() if p in dead]:
            del self.pages[h]

    def clear(self):
        self.pages.clear()


class RefcountAllocator(PageAllocator):
    """PageAllocator with per-page refcounts and a retained ("cached") set
    for pages the prefix index still references after their rows retire."""

    def __init__(self, n_pages: int, page_size: int, max_rows: int,
                 max_pages_per_row: int):
        super().__init__(n_pages, page_size, max_rows, max_pages_per_row)
        self.ref = np.zeros(n_pages, np.int32)
        self.cached: set = set()      # ref==0 but retained for the index
        self.pinned: set = set()      # pages the index references

    # -- allocation ---------------------------------------------------
    def allocate_row(self, row: int, n_tokens: int, headroom: int = 0,
                     shared: Sequence[int] = ()) -> bool:
        need = -(-(n_tokens + headroom) // self.page_size)
        n_fresh = need - len(shared)
        assert n_fresh >= 0
        if need > self.max_pages_per_row:
            return False
        if n_fresh > len(self.free) + len(self.cached):
            return False
        if n_fresh > len(self.free):
            return False  # caller flushes the cached set and retries
        self.tables[row, :] = 0
        for i, p in enumerate(shared):
            self.tables[row, i] = p
            if self.ref[p] == 0 and p in self.free:
                # belt-and-braces: a page can only be both shared and free
                # if the caller's hit list went stale (e.g. across a
                # flush_cached); re-reffing it must take it off the free
                # list or it would be handed out twice
                self.free.remove(p)
            self.ref[p] += 1
            self.cached.discard(p)    # active again
        for i in range(len(shared), need):
            p = self.free.pop()
            self.tables[row, i] = p
            self.ref[p] = 1
        self.n_alloc[row] = need
        return True

    def extend_row(self, row: int) -> bool:
        if self.n_alloc[row] >= self.max_pages_per_row or not self.free:
            return False
        p = self.free.pop()
        self.tables[row, self.n_alloc[row]] = p
        self.ref[p] = 1
        self.n_alloc[row] += 1
        return True

    def free_row(self, row: int):
        for i in range(int(self.n_alloc[row])):
            p = int(self.tables[row, i])
            self.ref[p] -= 1
            if self.ref[p] <= 0:
                self.ref[p] = 0
                if p in self.pinned:
                    self.cached.add(p)
                else:
                    self.free.append(p)
        self.n_alloc[row] = 0
        self.tables[row, :] = 0

    # -- prefix-cache management ---------------------------------------
    def pin(self, page_ids: Sequence[int]):
        self.pinned.update(int(p) for p in page_ids)

    def flush_cached(self) -> List[int]:
        """Move every retained page back to the free list; returns them so
        the caller can drop their index entries."""
        flushed = sorted(self.cached)
        self.free.extend(flushed)
        self.cached.clear()
        self.pinned.difference_update(flushed)
        return flushed


# ---------------------------------------------------------------------------
# suffix prefill
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _suffix_prefill_fn(cfg, n_prefix: int, s_suf: int, capacity: int):
    """cfg is a LlavaConfig; compiled per (prefix length, suffix bucket)."""
    from ..models.llama import (KVCache, embed_tokens, init_kv_cache,
                                llama_forward, lm_head)

    @jax.jit
    def f(params, k_sel, v_sel, suffix_ids, suffix_valid):
        # k_sel/v_sel: (layers, n_prefix, n_kv, Dh) gathered prefix KV
        dtype = jnp.dtype(cfg.llama.dtype)
        cache = init_kv_cache(cfg.llama, 1, capacity, dtype=dtype)
        cache = KVCache(
            k=jax.lax.dynamic_update_slice(
                cache.k, k_sel[:, None].astype(dtype), (0, 0, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(
                cache.v, v_sel[:, None].astype(dtype), (0, 0, 0, 0, 0)),
            valid=cache.valid.at[:, :n_prefix].set(True),
            positions=cache.positions.at[:, :n_prefix].set(
                jnp.arange(n_prefix)[None]),
            write_idx=jnp.asarray(n_prefix, jnp.int32),
        )
        embeds = embed_tokens(params["llama"], suffix_ids)       # (1, s_suf, D)
        pos = n_prefix + jnp.arange(s_suf)[None]                 # right-padded
        hidden, cache = llama_forward(
            params["llama"], cfg.llama, embeds, position_ids=pos,
            attn_valid=suffix_valid, cache=cache, q_index_offset=n_prefix)
        n_real = suffix_valid.sum(axis=1).astype(jnp.int32)      # (1,)
        idx = jnp.maximum(n_real - 1, 0)
        last = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)
        logits = lm_head(params["llama"], last)[:, 0]
        return logits, cache, n_prefix + n_real
    return f


@lru_cache(maxsize=64)
def _import_range_fn(n_skip: int, n_new: int, page_size: int,
                     paged_int8: bool):
    from .paged_cache import _quantize_pages

    @jax.jit
    def f(k, v):  # dense (layers, 1, capacity, kv, dh) -> new pages
        lo = n_skip * page_size
        hi = (n_skip + n_new) * page_size
        n_layers, _, _, n_kv, dh = k.shape
        kp = k[:, 0, lo:hi].reshape(n_layers, n_new, page_size, n_kv, dh)
        vp = v[:, 0, lo:hi].reshape(n_layers, n_new, page_size, n_kv, dh)
        if not paged_int8:
            return kp, vp, None, None
        # the suffix prefill's dense cache is always bf16 (its scratch
        # cache is built at model dtype) -> quantize into the int8 pool
        # (flat slot*n_kv+head scale layout — see PagedKVCache)
        kp, ks = _quantize_pages(kp)
        vp, vs = _quantize_pages(vp)
        ks = ks.reshape(n_layers, n_new, page_size * n_kv)
        vs = vs.reshape(n_layers, n_new, page_size * n_kv)
        return kp, vp, ks, vs
    return f


def import_page_range(paged: PagedKVCache, dense, n_skip: int, n_new: int,
                      page_ids, page_size: int) -> PagedKVCache:
    """Scatter dense slots [n_skip*page, (n_skip+n_new)*page) into pages."""
    kp, vp, ks, vs = _import_range_fn(
        n_skip, n_new, page_size, paged.k_scale is not None)(dense.k, dense.v)
    idx = jnp.asarray(np.asarray(page_ids[:n_new], np.int32))
    return PagedKVCache(
        paged.k.at[:, idx].set(kp.astype(paged.k.dtype)),
        paged.v.at[:, idx].set(vp.astype(paged.v.dtype)),
        k_scale=paged.k_scale if ks is None
        else paged.k_scale.at[:, idx].set(ks),
        v_scale=paged.v_scale if vs is None
        else paged.v_scale.at[:, idx].set(vs))

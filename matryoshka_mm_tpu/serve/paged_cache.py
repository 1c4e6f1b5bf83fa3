"""Paged KV cache.

Beyond-reference serving capability: instead of one fixed (B, capacity)
cache region per pool (which strands slots when requests join late or end
early), KV storage is a flat pool of fixed-size **pages**; each request
maps its logical token positions onto pages through a per-row page table.

* ``PagedKVCache``: (n_layers, n_pages, page_size, n_kv, Dh) K/V pools.
* ``PageAllocator``: host-side free list; admission takes pages for the
  prefill + headroom, decode extends a row page-by-page, retirement frees.
* ``paged_decode_step``: one jitted batched decode step — gathers each
  row's pages for attention, writes the new token's K/V into the row's
  current page slot.  Rows never share a page, so scatters don't conflict.
* dense->paged import scatters a solo prefill cache into a row's pages.

The gather materializes each row's KV view per layer (same HBM reads any
attention must do, plus one transient write); a Pallas paged-attention
kernel that reads pages in place is the planned upgrade.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.llama import (
    KVCache,
    LlamaConfig,
    _quantize_kv_slots,
    apply_rope,
    embed_tokens,
    lm_head,
    proj,
    rms_norm,
    rope_cos_sin,
)
from ..ops.attention import attention_reference


class PagedKVCache(NamedTuple):
    """With ``kv_cache_dtype='int8'`` the k/v pools hold int8 values and
    ``k_scale``/``v_scale`` the per-(layer, page, slot, kv-head) absmax
    dequant scales (models/llama.KVCache's quantization, paged); bf16
    pools leave the scales None.  int8 halves KV HBM per token, so a pool
    of the same byte budget holds 2x the pages — a serving-capacity knob.

    The scale pools are stored FLAT — ``(n_layers, n_pages,
    page_size * n_kv)`` with flat index ``slot * n_kv + head`` — not as
    the 4-D ``(..., page, n_kv)`` they logically are.  The Pallas paged
    kernels consume lane-aligned flat scale blocks; with 4-D storage XLA
    assigned the carried pools a scatter-friendly layout and then
    materialized a LAYOUT-CONVERTING copy of both full scale pools every
    layer of every decode step to feed the kernel's reshape — profiled at
    ~12 ms/step of pure copies on a 26 ms b8 decode step (round 5,
    scripts/diag_paged_round.py).  Flat 3-D storage has one natural
    layout, shared by the scatter writes and the kernel operands, so the
    copies vanish."""

    k: jnp.ndarray  # (n_layers, n_pages, page_size, n_kv, Dh)
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None  # (n_layers, n_pages, page*n_kv)
    v_scale: Optional[jnp.ndarray] = None


def init_paged_cache(cfg: LlamaConfig, n_pages: int, page_size: int,
                     dtype=None) -> PagedKVCache:
    dtype = dtype or (jnp.int8 if cfg.kv_cache_dtype == "int8"
                      else jnp.dtype(cfg.dtype))
    shape = (cfg.num_hidden_layers, n_pages, page_size,
             cfg.num_key_value_heads, cfg.head_dim)
    sshape = (cfg.num_hidden_layers, n_pages,
              page_size * cfg.num_key_value_heads)
    int8 = jnp.dtype(dtype) == jnp.int8
    return PagedKVCache(
        jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
        k_scale=jnp.zeros(sshape, jnp.float32) if int8 else None,
        v_scale=jnp.zeros(sshape, jnp.float32) if int8 else None)


# float (..., Dh) -> int8 values + f32 per-(..., head) absmax scale.
# One quantization scheme for the dense cache and the paged pools — the
# dense/paged int8 KV paths must never drift apart.
_quantize_pages = _quantize_kv_slots


def _check_dense_dtype(paged: PagedKVCache, dense) -> None:
    """A float page pool cannot absorb an int8 dense cache: astype on the
    quantization codes would silently drop the per-slot scales (garbage
    attention values).  The batcher derives both from one config so this
    never fires there; it guards direct library callers."""
    if paged.k_scale is None and getattr(dense, "k_scale", None) is not None:
        raise ValueError(
            "cannot import an int8 dense KV cache into a float page pool: "
            "the per-slot dequant scales would be dropped; build the pool "
            "with kv_cache_dtype='int8' (init_paged_cache default) or "
            "dequantize the dense cache first")


class PageAllocator:
    """Host-side page bookkeeping (free list + per-row tables)."""

    def __init__(self, n_pages: int, page_size: int, max_rows: int,
                 max_pages_per_row: int):
        self.page_size = page_size
        self.max_pages_per_row = max_pages_per_row
        # Page 0 is RESERVED as a trash page and never handed out: it is
        # also the placeholder in unallocated table slots, so a row that
        # overruns its allocation (a scheduler bug or a direct caller
        # violating the capacity contract) scatters into dead storage
        # instead of a page the free list may have given a live request.
        # The placeholder must stay a VALID page id — the Pallas paged
        # kernels DMA every table slot (grid covers all P slots; masking
        # happens in the kernel math), so an out-of-range sentinel would
        # produce out-of-bounds block indices.
        self.free: List[int] = list(range(1, n_pages))
        self.n_allocatable = n_pages - 1
        self.tables = np.full((max_rows, max_pages_per_row), 0, np.int32)
        self.n_alloc = np.zeros(max_rows, np.int32)

    def allocate_row(self, row: int, n_tokens: int, headroom: int = 0) -> bool:
        need = -(-(n_tokens + headroom) // self.page_size)
        if need > self.max_pages_per_row or len(self.free) < need:
            return False
        self.tables[row, :] = 0
        for i in range(need):
            self.tables[row, i] = self.free.pop()
        self.n_alloc[row] = need
        return True

    def extend_row(self, row: int) -> bool:
        if (self.n_alloc[row] >= self.max_pages_per_row
                or not self.free):
            return False
        self.tables[row, self.n_alloc[row]] = self.free.pop()
        self.n_alloc[row] += 1
        return True

    def capacity(self, row: int) -> int:
        return int(self.n_alloc[row]) * self.page_size

    def free_row(self, row: int):
        for i in range(int(self.n_alloc[row])):
            self.free.append(int(self.tables[row, i]))
        self.n_alloc[row] = 0
        self.tables[row, :] = 0


def import_dense_cache(paged: PagedKVCache, dense: KVCache, row_table,
                       page_size: int) -> PagedKVCache:
    """Scatter a solo (B=1) dense prefill cache into a row's pages.

    dense.k: (n_layers, 1, S, n_kv, Dh) with S a multiple of page_size;
    row_table: (P,) page indices for ceil(S/page_size) pages (numpy).
    """
    _check_dense_dtype(paged, dense)
    n_layers, _, S, n_kv, Dh = dense.k.shape
    n_p = S // page_size
    k_pages = dense.k[:, 0].reshape(n_layers, n_p, page_size, n_kv, Dh)
    v_pages = dense.v[:, 0].reshape(n_layers, n_p, page_size, n_kv, Dh)
    idx = jnp.asarray(np.asarray(row_table[:n_p], np.int32))
    if paged.k_scale is None:
        return PagedKVCache(
            k=paged.k.at[:, idx].set(k_pages.astype(paged.k.dtype)),
            v=paged.v.at[:, idx].set(v_pages.astype(paged.v.dtype)),
        )
    if dense.k_scale is not None:       # int8 dense -> int8 pages, as-is
        ks = dense.k_scale[:, 0].reshape(n_layers, n_p, page_size * n_kv)
        vs = dense.v_scale[:, 0].reshape(n_layers, n_p, page_size * n_kv)
    else:                               # bf16 dense -> quantize into pages
        k_pages, ks = _quantize_pages(k_pages)
        v_pages, vs = _quantize_pages(v_pages)
        ks = ks.reshape(n_layers, n_p, page_size * n_kv)
        vs = vs.reshape(n_layers, n_p, page_size * n_kv)
    return PagedKVCache(
        k=paged.k.at[:, idx].set(k_pages.astype(paged.k.dtype)),
        v=paged.v.at[:, idx].set(v_pages.astype(paged.v.dtype)),
        k_scale=paged.k_scale.at[:, idx].set(ks),
        v_scale=paged.v_scale.at[:, idx].set(vs),
    )


def _decode_core(params, cfg: LlamaConfig, k_all, v_all, tables, row_len,
                 tokens, active, *, max_pages: int, page_size: int,
                 use_kernel: bool, lora_pack=None, lora_idx=None,
                 ks_all=None, vs_all=None):
    """One batched paged decode step (traced);
    -> (k_all, v_all, ks_all, vs_all, logits).

    Inactive rows neither read (0-length mask) nor write: their scatter
    index is pushed out of bounds and dropped, so a retired row whose page
    table was recycled can never clobber a live row's pages.

    ``lora_pack``/``lora_idx`` enable multi-LoRA serving: each row applies
    its own low-rank delta on every projection (serve/multi_lora.py).

    ``tokens`` may be (B,) — one decode token per row — or (B, S) for a
    speculative verify step: all S tokens' K/V land in the row's pages at
    slots [row_len, row_len + S) and every position's logits come back;
    causality inside the block rides the position-based attention mask.
    Rejected drafts need no rewind — ``row_len`` only advances over the
    accepted prefix, so stale slots beyond it are masked and overwritten
    by the next write."""
    tokens = tokens if tokens.ndim == 2 else tokens[:, None]
    B, S = tokens.shape
    H, Hkv, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    n_pages = k_all.shape[1]
    S_virt = max_pages * page_size
    # The paged Pallas kernels don't implement windowed attention: a
    # mistral-style sliding_window config must take the gather path,
    # which masks kv older than the window (otherwise rows longer than
    # the window silently attend to expired tokens and diverge from the
    # dense backend / HF reference).
    use_kernel = use_kernel and not cfg.sliding_window
    # S>1 (speculative verify) always uses the gather path: the S-block
    # paged-kernel variant was measured slower on hardware (round 4,
    # docs/Architecture.md negative results) and deleted
    use_kernel = use_kernel and S == 1

    hidden = embed_tokens(params, tokens)                 # (B, S, D)
    pos = row_len[:, None] + jnp.arange(S)[None]          # (B, S)
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)

    # per-(row, position) write location; inactive rows go out of
    # bounds -> dropped
    w_page = jnp.minimum(pos // page_size, max_pages - 1)
    w_off = pos % page_size
    w_page_id = jnp.take_along_axis(tables, w_page, axis=1)   # (B, S)
    w_page_id = jnp.where(active[:, None], w_page_id, n_pages)

    kv_pos = (jnp.arange(S_virt)[None, :]).astype(jnp.int32)
    kv_valid = (kv_pos < (row_len + S)[:, None]) & active[:, None]

    if lora_pack is not None:
        from .multi_lora import lora_delta, pack_layer_slices

        lp_slices = pack_layer_slices(lora_pack)

        def mm(x, w_leaf, la_xs, key):
            return proj(x, w_leaf) + lora_delta(
                x, la_xs.a[key], la_xs.b[key], la_xs.s[key], lora_idx)
    else:
        lp_slices = None

        def mm(x, w_leaf, la_xs, key):
            return proj(x, w_leaf)

    kv_int8 = ks_all is not None

    def write_kv(k_all, v_all, ks_all, vs_all, idx, k_new, v_new):
        """Write the new tokens' (B, S, heads, Dh) K/V into each row's
        page slots; int8 pools quantize per (row, slot, head) and store the
        absmax scale alongside (flat slot*n_kv+head layout — see
        PagedKVCache).  Inactive rows' indices are out of bounds ->
        dropped."""
        if kv_int8:
            heads = k_new.shape[2]
            k_new, ks = _quantize_pages(k_new)
            v_new, vs = _quantize_pages(v_new)
            off_f = (w_off[..., None] * heads
                     + jnp.arange(heads)[None, None])       # (B, S, heads)
            pid_f = jnp.broadcast_to(w_page_id[..., None], off_f.shape)
            ks_all = ks_all.at[idx, pid_f, off_f].set(ks, mode="drop")
            vs_all = vs_all.at[idx, pid_f, off_f].set(vs, mode="drop")
        k_all = k_all.at[idx, w_page_id, w_off].set(
            k_new.astype(k_all.dtype), mode="drop")
        v_all = v_all.at[idx, w_page_id, w_off].set(
            v_new.astype(v_all.dtype), mode="drop")
        return k_all, v_all, ks_all, vs_all

    def gather_rows(pool, s_pool, idx, heads):
        """Gather one layer's pages for this batch's rows; int8 pools
        dequantize right after the (half-width) gather."""
        p = jax.lax.dynamic_index_in_dim(pool, idx, 0, keepdims=False)
        rows = p[tables].reshape(B, S_virt, heads, Dh)
        if kv_int8:
            sp = jax.lax.dynamic_index_in_dim(s_pool, idx, 0, keepdims=False)
            s_rows = sp[tables].reshape(B, S_virt, heads)
            rows = (rows.astype(jnp.float32)
                    * s_rows[..., None]).astype(hidden.dtype)
        return rows

    def mpt_body(carry, xs):
        """MPT block (alibi, fused qkv, GELU MLP): no RoPE — the bias
        encodes position; attention runs through the gather path (the
        Pallas decode kernel is RoPE-model only).  Reference family:
        llava/model/language_model/llava_mpt.py."""
        from ..models.llama import alibi_slopes, layer_norm_nobias

        h, k_all, v_all, ks_all, vs_all = carry
        idx, lp, la_xs = xs
        a = lp["attn"]
        x = layer_norm_nobias(h, lp["norm_1"], 1e-5)
        qkv = mm(x, a["Wqkv"], la_xs, ("attn", "Wqkv"))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, Dh)
        v = v.reshape(B, S, H, Dh)

        k_all, v_all, ks_all, vs_all = write_kv(
            k_all, v_all, ks_all, vs_all, idx, k, v)
        k_rows = gather_rows(k_all, ks_all, idx, H)
        v_rows = gather_rows(v_all, vs_all, idx, H)
        slopes = alibi_slopes(H)
        rel = (pos[:, None, :, None] - kv_pos[:, None, None, :]
               ).astype(jnp.float32)
        bias = -slopes[None, :, None, None] * jnp.maximum(rel, 0)
        attn = attention_reference(
            q, k_rows.transpose(0, 2, 1, 3), v_rows.transpose(0, 2, 1, 3),
            causal=True, q_positions=pos, kv_positions=kv_pos,
            kv_valid=kv_valid, bias=bias)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
        h = h + mm(attn, a["out_proj"], la_xs, ("attn", "out_proj"))

        x = layer_norm_nobias(h, lp["norm_2"], 1e-5)
        f = lp["ffn"]
        h = h + mm(jax.nn.gelu(mm(x, f["up_proj"], la_xs,
                                  ("ffn", "up_proj")), approximate=False),
                   f["down_proj"], la_xs, ("ffn", "down_proj"))
        return (h, k_all, v_all, ks_all, vs_all), None

    def body(carry, xs):
        h, k_all, v_all, ks_all, vs_all = carry
        idx, lp, la_xs = xs
        if stacked_int4:
            lp = index_layer_tree(params["layers"], idx)
        if cfg.arch == "mpt":
            return mpt_body(carry, (idx, lp, la_xs))
        a = lp["self_attn"]
        x = rms_norm(h, lp["input_layernorm"], cfg.rms_norm_eps)
        if "qkv_proj" in a:
            # fused int4 layout (ops/quant.py): one kernel for q+k+v
            qkv = mm(x, a["qkv_proj"], la_xs, None)
            q, k, v = jnp.split(qkv, [H * Dh, H * Dh + Hkv * Dh],
                                axis=-1)
        else:
            q = mm(x, a["q_proj"], la_xs, ("self_attn", "q_proj"))
            k = mm(x, a["k_proj"], la_xs, ("self_attn", "k_proj"))
            v = mm(x, a["v_proj"], la_xs, ("self_attn", "v_proj"))
        q = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, Hkv, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, Hkv, Dh).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        # write new kv into each row's page slots of THIS layer's
        # slice in the stacked pool (in place on the scan carry), then
        # read back only this layer's pool for attention
        k_all, v_all, ks_all, vs_all = write_kv(
            k_all, v_all, ks_all, vs_all, idx,
            k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

        if use_kernel:
            from ..ops.paged_attention import paged_decode_attention_stacked

            # retired rows get 0-length attention (harmless; masked out);
            # the stacked kernel reads pages straight out of layer `idx`
            # — slicing k_all[idx] first would make XLA materialize the
            # whole per-layer pool every layer
            eff_len = jnp.where(active, row_len, 0)
            attn = paged_decode_attention_stacked(
                q[:, :, 0, :], k_all, v_all, idx, tables, eff_len,
                k_scale=ks_all, v_scale=vs_all)
            attn = attn.reshape(B, 1, H * Dh)
        else:
            # gather each row's pages -> (B, S_virt, n_kv, Dh)
            k_rows = gather_rows(k_all, ks_all, idx, Hkv)
            v_rows = gather_rows(v_all, vs_all, idx, Hkv)
            attn = attention_reference(
                q, k_rows.transpose(0, 2, 1, 3),
                v_rows.transpose(0, 2, 1, 3),
                causal=True, q_positions=pos, kv_positions=kv_pos,
                kv_valid=kv_valid,
                sliding_window=cfg.sliding_window or None)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
        m = lp["mlp"]
        h = h + mm(attn, a["o_proj"], la_xs, ("self_attn", "o_proj"))

        x = rms_norm(h, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        # whole-MLP single-kernel decode path (ops/fused_mlp.py) — the
        # same default the dense decode uses; side-band multi-LoRA keeps
        # the unfused mm() so the per-row deltas apply
        from ..ops.quant import fused_quant_mlp

        mlp_out = None if lora_pack is not None else fused_quant_mlp(x, m)
        if mlp_out is None:
            if "gateup_proj" in m:
                gate, up = jnp.split(mm(x, m["gateup_proj"], la_xs, None),
                                     2, axis=-1)
            else:
                gate = mm(x, m["gate_proj"], la_xs, ("mlp", "gate_proj"))
                up = mm(x, m["up_proj"], la_xs, ("mlp", "up_proj"))
            mlp_out = mm(jax.nn.silu(gate) * up, m["down_proj"],
                         la_xs, ("mlp", "down_proj"))
        h = h + mlp_out
        return (h, k_all, v_all, ks_all, vs_all), None

    # int4-packed layers scan over layer indices so the stacked packed
    # weights reach the fused kernels unsliced (see models/llama.py)
    from ..ops.quant import index_layer_tree, tree_has_int4

    stacked_int4 = tree_has_int4(params["layers"])
    layer_ids = jnp.arange(cfg.num_hidden_layers)
    # the stacked pools ride the CARRY (in-place slot writes), not xs/ys —
    # the xs/ys form re-stacked the full pool every step (models/llama.py)
    layer_xs = None if stacked_int4 else params["layers"]
    (hidden, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
        body, (hidden, k_all, v_all, ks_all, vs_all),
        (layer_ids, layer_xs, lp_slices))
    if cfg.arch == "mpt":
        from ..models.llama import layer_norm_nobias

        hidden = layer_norm_nobias(hidden, params["norm"], 1e-5)
    else:
        hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
    logits = lm_head(params, hidden)             # (B, S, V)
    return new_k, new_v, new_ks, new_vs, logits


@lru_cache(maxsize=8)
def _paged_decode_fn(cfg: LlamaConfig, max_pages: int, page_size: int,
                     use_kernel: bool):
    """(params, paged, tables (B,P), row_len (B,), tokens (B,), active (B,))
    -> (paged, logits).  One decode step for every active row.

    ``use_kernel`` routes attention through the Pallas paged-attention
    kernel (pages read in place); otherwise pages are gathered and fed to
    the reference attention."""

    # donate the pool like the sibling decode fns: without it XLA cannot
    # alias the .at[].set slot writes into the live input buffers and
    # copies the entire multi-GB KV pool every step
    @partial(jax.jit, donate_argnums=(1,))
    def step(params, paged: PagedKVCache, tables, row_len, tokens, active):
        new_k, new_v, new_ks, new_vs, logits = _decode_core(
            params, cfg, paged.k, paged.v, tables, row_len, tokens, active,
            max_pages=max_pages, page_size=page_size, use_kernel=use_kernel,
            ks_all=paged.k_scale, vs_all=paged.v_scale)
        return PagedKVCache(new_k, new_v, new_ks, new_vs), logits[:, 0]

    return step


@lru_cache(maxsize=8)
def _import_prefill_fn(n_pt: int, page_size: int, paged_int8: bool,
                       dense_int8: bool):
    """One donated jit for the whole prefill import: compact + quantize +
    scatter.  Traced on the FULL row width ``n_pt`` (= pages_per_row), not
    the request's page count — the old per-``n_p`` traces meant every new
    prompt-length bucket paid a mid-load compile that landed directly in
    a user's TTFT (round-4 diagnosis: a 7.4s first-admission staircase the
    warmup's shorter prompts could not cover).  Donating the pool also
    replaces the previous FOUR eager whole-pool ``.at[].set`` copies per
    row (~1.6GB of pure copy traffic each admission) with in-place
    dynamic-update scatters."""

    @partial(jax.jit, donate_argnums=(0,))
    def f(paged: PagedKVCache, k, v, ks, vs, pad, idx):
        n_layers, _, S, Hkv, Dh = k.shape
        T = n_pt * page_size
        kr = jnp.roll(k[:, 0], -pad, axis=1)[:, :T].reshape(
            n_layers, n_pt, page_size, Hkv, Dh)
        vr = jnp.roll(v[:, 0], -pad, axis=1)[:, :T].reshape(
            n_layers, n_pt, page_size, Hkv, Dh)
        ksr = vsr = None
        if paged_int8:
            if dense_int8:
                # dense scales are flat (L, B, S*Hkv) — roll by whole
                # slots (pad*Hkv flat elements)
                ksr = jnp.roll(ks[:, 0], -pad * Hkv, axis=1)[
                    :, :T * Hkv].reshape(n_layers, n_pt, page_size * Hkv)
                vsr = jnp.roll(vs[:, 0], -pad * Hkv, axis=1)[
                    :, :T * Hkv].reshape(n_layers, n_pt, page_size * Hkv)
            else:
                kr, ksr = _quantize_pages(kr)
                vr, vsr = _quantize_pages(vr)
                ksr = ksr.reshape(n_layers, n_pt, page_size * Hkv)
                vsr = vsr.reshape(n_layers, n_pt, page_size * Hkv)
        return PagedKVCache(
            k=paged.k.at[:, idx].set(kr.astype(paged.k.dtype)),
            v=paged.v.at[:, idx].set(vr.astype(paged.v.dtype)),
            k_scale=paged.k_scale if ksr is None
            else paged.k_scale.at[:, idx].set(ksr),
            v_scale=paged.v_scale if vsr is None
            else paged.v_scale.at[:, idx].set(vsr),
        )

    return f


def import_prefill(paged: PagedKVCache, dense: KVCache, pad: int, row_table,
                   n_p: int, page_size: int) -> PagedKVCache:
    """Compact a left-padded solo prefill cache into a row's first pages.

    ``dense`` is a (B=1) cache whose valid tokens occupy [pad, pad+T);
    after compaction token i lands in page i // page_size at offset
    i % page_size.  Slots past T hold rolled-around pad garbage, masked
    out by ``row_len`` at decode time.

    The import always writes the full ``row_table`` worth of pages so the
    jit trace is independent of the request's page count ``n_p`` (kept
    for API compatibility): table entries past the row's allocation are
    the allocator's reserved trash page 0, so the garbage tail scatters
    into dead storage."""
    _check_dense_dtype(paged, dense)
    n_pt = min(len(row_table), dense.k.shape[2] // page_size)
    idx = jnp.asarray(np.asarray(row_table[:n_pt], np.int32))
    return _import_prefill_fn(
        n_pt, page_size, paged.k_scale is not None,
        dense.k_scale is not None)(
        paged, dense.k, dense.v, dense.k_scale, dense.v_scale,
        jnp.int32(pad), idx)


@lru_cache(maxsize=8)
def _import_prefill_group_fn(G: int, n_pt: int, page_size: int,
                             paged_int8: bool, dense_int8: bool):
    """Group-admission import: compact + quantize + scatter ALL ``G`` rows
    of one batched prefill cache into their pages with ONE donated jit.

    The per-member solo imports this replaces cost G dispatches plus G
    eager row-slice copies of the (n_layers, G, S, ...) cache through the
    device tunnel — measured as a large share of the admission stall that
    kept the device idle ~45% of a sustained-load window (round 5
    diagnosis, scripts/diag_sustained.py).  Rows whose page allocation
    failed pass an all-zero table (the allocator's reserved trash page),
    so their data scatters into dead storage and the trace stays keyed on
    ``G`` alone."""

    @partial(jax.jit, donate_argnums=(0,))
    def f(paged: PagedKVCache, k, v, ks, vs, pads, idx):
        n_layers, _, S, Hkv, Dh = k.shape
        T = n_pt * page_size

        def compact(x):
            """(n_layers, G, S, ...) -> (n_layers, G*n_pt, page, ...):
            left-pad removed per row, then paged."""
            rolled = jax.vmap(
                lambda row, pad: jnp.roll(row, -pad, axis=1),
                in_axes=(1, 0), out_axes=1)(x, pads)[:, :, :T]
            return rolled.reshape((n_layers, G * n_pt, page_size)
                                  + x.shape[3:])

        kr, vr = compact(k), compact(v)
        ksr = vsr = None
        if paged_int8:
            Hkv = k.shape[3]
            if dense_int8:
                # dense scales are flat (L, G, S*Hkv): roll by whole
                # slots, then page the flat axis directly
                def compact_flat(x):
                    rolled = jax.vmap(
                        lambda row, pad: jnp.roll(row, -pad * Hkv, axis=1),
                        in_axes=(1, 0), out_axes=1)(x, pads)[:, :, :T * Hkv]
                    return rolled.reshape(n_layers, G * n_pt,
                                          page_size * Hkv)

                ksr, vsr = compact_flat(ks), compact_flat(vs)
            else:
                kr, ksr = _quantize_pages(kr)
                vr, vsr = _quantize_pages(vr)
                ksr = ksr.reshape(n_layers, G * n_pt, page_size * Hkv)
                vsr = vsr.reshape(n_layers, G * n_pt, page_size * Hkv)
        flat = idx.reshape(-1)
        return PagedKVCache(
            k=paged.k.at[:, flat].set(kr.astype(paged.k.dtype)),
            v=paged.v.at[:, flat].set(vr.astype(paged.v.dtype)),
            k_scale=paged.k_scale if ksr is None
            else paged.k_scale.at[:, flat].set(ksr),
            v_scale=paged.v_scale if vsr is None
            else paged.v_scale.at[:, flat].set(vsr),
        )

    return f


def import_prefill_group(paged: PagedKVCache, dense: KVCache, pads,
                         row_tables, page_size: int) -> PagedKVCache:
    """Import a (G, L) batched prefill into G rows' pages in one call.

    ``pads``: per-row left-pad counts (G,) host ints; ``row_tables``:
    (G, n_pt) page ids (numpy) — full row width, trailing entries the
    trash page.  See :func:`import_prefill` for the solo semantics this
    batches."""
    _check_dense_dtype(paged, dense)
    tables = np.asarray(row_tables, np.int32)
    G, n_pt = tables.shape
    n_pt = min(n_pt, dense.k.shape[2] // page_size)
    return _import_prefill_group_fn(
        G, n_pt, page_size, paged.k_scale is not None,
        dense.k_scale is not None)(
        paged, dense.k, dense.v, dense.k_scale, dense.v_scale,
        jnp.asarray(np.asarray(pads, np.int32)),
        jnp.asarray(tables[:, :n_pt]))


@lru_cache(maxsize=8)
def _paged_pool_decode_fn(cfg, gen_cfg, steps: int, max_pages: int,
                          page_size: int, use_kernel: bool,
                          fsm: bool = False):
    """Chunked batched decode over a paged pool with sampling/eos/budget —
    the paged counterpart of batching._pool_decode_fn.  ``cfg`` is a
    LlavaConfig (params carry the "llama" subtree).

    The caller must guarantee every active row has page capacity for
    row_len + steps tokens before invoking (the scheduler extends rows
    between chunks); rows that finish mid-chunk simply stop writing.

    ``fsm`` enables constrained decoding (serve/constrained.py): each
    row carries a DFA state; the state's allow row masks the logits
    before selection and the dense transition table advances it — the
    whole automaton lives inside the scan, no host round-trips."""
    from ..generate import _select_token

    # donate the page pools: the scheduler replaces self.paged with the
    # returned pools every chunk, and a decode error kills the batcher
    @partial(jax.jit, donate_argnums=(1,))
    def decode(llama_params, paged, tables, row_len, tokens, budget,
               active, rng, lora_pack=None, lora_idx=None,
               fsm_allow=None, fsm_trans=None, fsm_state=None):
        def step(carry, _):
            paged, token, row_len, budget, active, rng, fstate = carry
            k_all, v_all, ks_all, vs_all, logits = _decode_core(
                llama_params, cfg.llama, paged.k, paged.v, tables,
                row_len, token, active, max_pages=max_pages,
                page_size=page_size, use_kernel=use_kernel,
                lora_pack=lora_pack, lora_idx=lora_idx,
                ks_all=paged.k_scale, vs_all=paged.v_scale)
            paged = PagedKVCache(k_all, v_all, ks_all, vs_all)
            logit0 = logits[:, 0]
            if fsm:
                logit0 = jnp.where(fsm_allow[fstate], logit0, -1e30)
            nxt, rng2 = _select_token(logit0, gen_cfg, rng)
            if fsm:
                fstate = jnp.where(active, fsm_trans[fstate, nxt], fstate)
            # -1 = "no token this step" in the emitted stream (out-of-band
            # — a genuinely sampled pad_token_id must not be dropped by
            # the host's filter); the carried token stays a valid id for
            # the next embedding gather
            emit = jnp.where(active, nxt, -1)
            nxt = jnp.where(active, nxt, gen_cfg.pad_token_id)
            row_len = row_len + active.astype(row_len.dtype)
            budget = jnp.where(active, budget - 1, budget)
            active = active & (nxt != gen_cfg.eos_token_id) & (budget > 0)
            return (paged, nxt, row_len, budget, active, rng2, fstate), emit

        if not fsm:
            fsm_state = jnp.zeros_like(tokens)
        # echo the pre-round tokens as a FRESH output buffer: deferred
        # admissions read their prefill's first token from here when the
        # round is processed.  The scheduler must never host-fetch a
        # buffer whose lineage later programs consume — on the tunneled
        # platform such a fetch blocks until those consumers (and their
        # compiles) finish (round-5 measurement: scripts/diag_sustained
        # stack dumps + /tmp repro variants) — so the first token must
        # come out of the round itself, not a separate early fetch.
        tokens_in = tokens + 0
        (paged, token, row_len, budget, active, rng, fsm_state), toks = (
            jax.lax.scan(step, (paged, tokens, row_len, budget,
                                active, rng, fsm_state),
                         jnp.arange(steps)))
        return paged, token, row_len, budget, active, toks.T, fsm_state, \
            tokens_in

    return decode


@lru_cache(maxsize=8)
def _paged_spec_verify_fn(cfg, gen_cfg, k: int, max_pages: int,
                          page_size: int, use_kernel: bool = False):
    """Batched speculative verify step over the paged pool (greedy only).

    One Sq=k+1 forward per dispatch scores every row's k host-proposed
    draft tokens (prompt-lookup, generate._ngram_propose) at the cost of
    roughly one decode step's weight reads; each row accepts its
    greedy-consistent draft prefix plus the model's own next token, so a
    step emits 1..k+1 tokens per row.  The draft block's K/V are written
    into the row's pages up front; rejected tails need no rewind — a row's
    ``row_len`` only advances over accepted tokens, so stale slots are
    masked at read time and overwritten by the next block (unlike the
    dense cache's explicit valid-bit rewind, generate._rewind_fn).

    Reference point: the solo on-device prompt-lookup loop
    (generate._pld_loop_fn); this is its continuous-batching counterpart.
    eos/budget semantics match the vanilla pool decode: the eos token
    itself is emitted, everything after it in the block is dropped, and
    a row deactivates on eos or exhausted budget."""
    eos, pad = gen_cfg.eos_token_id, gen_cfg.pad_token_id

    @partial(jax.jit, donate_argnums=(1,))
    def verify(llama_params, paged, tables, row_len, tokens, drafts, budget,
               active, lora_pack=None, lora_idx=None):
        B = tokens.shape[0]
        block = jnp.concatenate([tokens[:, None], drafts], axis=1)  # (B,k+1)
        k_all, v_all, ks_all, vs_all, logits = _decode_core(
            llama_params, cfg.llama, paged.k, paged.v, tables, row_len,
            block, active, max_pages=max_pages, page_size=page_size,
            use_kernel=use_kernel, lora_pack=lora_pack, lora_idx=lora_idx,
            ks_all=paged.k_scale, vs_all=paged.v_scale)
        paged = PagedKVCache(k_all, v_all, ks_all, vs_all)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)

        match = drafts == greedy[:, :k]
        n_acc = jnp.where(match.all(axis=1), k,
                          jnp.argmax(~match, axis=1)).astype(jnp.int32)
        j = jnp.arange(k + 1)[None]
        is_eos = greedy == eos
        eos_before = jnp.cumsum(is_eos, axis=1) - is_eos.astype(jnp.int32)
        keep = ((j <= n_acc[:, None]) & (eos_before == 0)
                & (j < budget[:, None]) & active[:, None])
        n_emit = keep.sum(axis=1).astype(jnp.int32)
        # -1 = "lane not kept" (out-of-band: a kept greedy token equal to
        # pad_token_id must reach the host, or its history desyncs from
        # the device cache and later drafts/re-prompts diverge)
        out = jnp.where(keep, greedy, -1)

        row_len = row_len + n_emit
        budget = budget - n_emit
        active = (active & ~(keep & is_eos).any(axis=1) & (budget > 0)
                  & (n_emit > 0))
        nxt = jnp.take_along_axis(
            greedy, jnp.clip(n_emit - 1, 0, k)[:, None], axis=1)[:, 0]
        nxt = jnp.where(active, nxt, pad)
        return paged, nxt, row_len, budget, active, out, n_emit

    return verify


def paged_decode_step(params, cfg: LlamaConfig, paged: PagedKVCache,
                      tables: jnp.ndarray, row_len: jnp.ndarray,
                      tokens: jnp.ndarray, active: jnp.ndarray,
                      page_size: int,
                      use_kernel: Optional[bool] = None
                      ) -> Tuple[PagedKVCache, jnp.ndarray]:
    if use_kernel is None:
        # Mosaic can't slice the lane dim: the kernel needs 128-aligned Dh
        head_dim = cfg.hidden_size // cfg.num_attention_heads
        use_kernel = (jax.default_backend() == "tpu"
                      and head_dim % 128 == 0)
    max_pages = tables.shape[1]
    fn = _paged_decode_fn(cfg, max_pages, page_size, bool(use_kernel))
    return fn(params, paged, tables, row_len, tokens, active)

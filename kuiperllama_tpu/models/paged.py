"""Decoder forward over the paged KV cache.

Two entry points mirroring the dense path (models/decoder.py):
  * prefill_paged  — one prompt row: causal self-attention over the prompt's
    own K/V (a fresh request has no prior context to read) + scatter of the
    prompt's K/V into its allocated pages;
  * decode_chunk_paged — scan of decode steps for the whole batch: each step
    scatters the new token's K/V into pages and runs the flash-decode paged
    attention kernel against the page pool.

The scheduler (serving/engine.py) owns page tables/allocator on host and
pre-extends each sequence's pages to cover a whole chunk before launching it;
not-yet-written page slots are masked by seq_lens inside the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..ops.attention import attention_dense
from ..ops.linear import linear, linear_layered
from ..ops.pallas.paged_attention import paged_attention_flat
from ..ops.rmsnorm import rmsnorm
from ..ops.rope import apply_rope, gather_rope
from ..ops.sampling import sample_token
from .decoder import build_rope

# Weights stay STACKED through the layer scan (see models/decoder.py:
# slicing a stacked weight before a pallas_call materializes a copy of the
# whole layer's weights — decode's HBM budget); linear_layered indexes the
# layer inside the kernel.

# perf-debug switch (tools/exp_paged-style ablations): skip KV writes in the
# decode step to isolate the scatter's cost. NEVER set in production.
_DEBUG_SKIP_WRITES = False


def _qkv(cfg, blocks, li, x, s, c, B, T):
    hd = cfg.head_dim
    h = rmsnorm(x, blocks["attn_norm"][li], cfg.norm_eps)
    if "wqkv" in blocks:  # fused projection (fuse.py)
        H = blocks["wo"].shape[-2] // hd
        KH = (blocks["wqkv"].shape[-1] - H * hd) // (2 * hd)
        qkv = linear_layered(h, blocks["wqkv"], li, blocks.get("bqkv"))
        q = qkv[..., : H * hd].reshape(B, T, H, hd)
        k = qkv[..., H * hd : (H + KH) * hd].reshape(B, T, KH, hd)
        v = qkv[..., (H + KH) * hd :].reshape(B, T, KH, hd)
    else:
        H = blocks["wq"].shape[-1] // hd
        KH = blocks["wk"].shape[-1] // hd
        q = linear_layered(h, blocks["wq"], li, blocks.get("bq")).reshape(
            B, T, H, hd)
        k = linear_layered(h, blocks["wk"], li, blocks.get("bk")).reshape(
            B, T, KH, hd)
        v = linear_layered(h, blocks["wv"], li, blocks.get("bv")).reshape(
            B, T, KH, hd)
    q = apply_rope(q, s, c, cfg.rope_style)
    k = apply_rope(k, s, c, cfg.rope_style)
    return q, k, v, H, KH


def _mlp_residual(cfg, blocks, li, x, attn_out, B, T, H, hd, tp_axis=None,
                  wo_psum=True):
    """Attention output projection + SwiGLU MLP with residuals. Under tensor
    parallelism (tp_axis set) wo/w2 are row-parallel: psum after each.
    Sequence-parallel mode replicates wo (wo_psum=False) — only w2's psum
    remains."""
    def maybe_psum(v, on=True):
        return lax.psum(v, tp_axis) if (tp_axis and on) else v

    x = x + maybe_psum(
        linear_layered(attn_out.reshape(B, T, H * hd), blocks["wo"], li),
        on=wo_psum)
    h = rmsnorm(x, blocks["ffn_norm"][li], cfg.norm_eps)
    if "w13" in blocks:  # fused gate|up projection (fuse.py)
        hidden = blocks["w2"].shape[-2]
        g13 = linear_layered(h, blocks["w13"], li)
        gate, up = g13[..., :hidden], g13[..., hidden:]
    else:
        gate = linear_layered(h, blocks["w1"], li)
        up = linear_layered(h, blocks["w3"], li)
    act = (gate.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))
           ).astype(x.dtype) * up
    return x + maybe_psum(linear_layered(act, blocks["w2"], li))


def _write_chunk_pages(layer_idx, kp_all, vp_all, k2, v2, chunk_pages, ps):
    """Write [B, T, kv_dim] K/V into pages, page-granular.

    chunk_pages [B, n_chunks] is the physical page of each ps-wide chunk of
    the T axis (already clamped into range; garbage writes target page 0).
    Whole-page chunks stream through ONE fori_loop of dynamic_update_slice
    ops (in place through the loop carry); a partial tail chunk (T not a
    page multiple — test-sized only, the engine buckets T) unrolls per row.
    """
    B, T, _ = k2.shape
    n_chunks = chunk_pages.shape[1]
    n_full = min(T // ps, n_chunks)
    tail = T - n_full * ps if n_full < n_chunks else 0
    zero = jnp.zeros((), jnp.int32)
    if n_full:
        k2f = k2[:, : n_full * ps].reshape(B, n_full, ps, k2.shape[-1])
        v2f = v2[:, : n_full * ps].reshape(B, n_full, ps, v2.shape[-1])

        def body(i, kv):
            kp, vp = kv
            b, ci = i // n_full, i % n_full
            start = (layer_idx, chunk_pages[b, ci], zero, zero)
            upd_k = lax.dynamic_index_in_dim(
                lax.dynamic_index_in_dim(k2f, b, 0, keepdims=False),
                ci, 0, keepdims=False)[None, None]
            upd_v = lax.dynamic_index_in_dim(
                lax.dynamic_index_in_dim(v2f, b, 0, keepdims=False),
                ci, 0, keepdims=False)[None, None]
            return (lax.dynamic_update_slice(kp, upd_k, start),
                    lax.dynamic_update_slice(vp, upd_v, start))

        kp_all, vp_all = lax.fori_loop(0, B * n_full, body, (kp_all, vp_all))
    if tail:
        for b in range(B):  # bounded by max_batch
            start = (layer_idx, chunk_pages[b, n_full], zero, zero)
            upd_k = k2[b, n_full * ps:][None, None]
            upd_v = v2[b, n_full * ps:][None, None]
            kp_all = lax.dynamic_update_slice(kp_all, upd_k, start)
            vp_all = lax.dynamic_update_slice(vp_all, upd_v, start)
    return kp_all, vp_all


def prefill_paged_inner(cfg: ModelConfig, params, tokens, prompt_lens,
                        k_pages, v_pages, token_pages, token_offs,
                        tp_axis=None, logits_all_gather: bool = True,
                        seqpar: bool = False):
    """Batched prefill of admitted requests (the round-1 engine prefilled
    one request at a time, stalling decode per admission — this runs ONE
    forward for the whole admit batch). Un-jitted body; see prefill_paged
    for the single-device jit and parallel/sharded_paged.py for the
    shard_map wrapper (tp_axis = mesh axis of the tensor-parallel shard).

    tokens [B, T]; prompt_lens [B]; token_pages/token_offs [B, T] map each
    prompt position to its (physical page, in-page offset) — use a large
    positive page sentinel (2**30) for padding rows/slots; those writes are
    redirected to the reserved garbage page 0 (kvcache.py). token_offs is
    accepted for interface stability but prefill positions always start at
    0, so in-page offsets are implied by position. Returns
    (last_logits [B, vocab], k_pages, v_pages)."""
    B, T = tokens.shape
    hd = cfg.head_dim
    x = params["tok_emb"][tokens]
    sin, cos = build_rope(cfg)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    s, c = gather_rope(sin, cos, positions)
    slot = jnp.arange(T, dtype=jnp.int32)
    kv_mask = slot[None, :] < prompt_lens[:, None]

    blocks = params["blocks"]

    # page of each ps-aligned prompt chunk (pool layout [L, P, ps, KH*hd]:
    # tokens on sublanes — a chunk's K/V is ONE contiguous DUS per row,
    # which XLA keeps in place; see kvcache.py). Chunks past a prompt's end
    # carry the pad sentinel -> write to the garbage page 0. In-chunk slots
    # past prompt_len write into the row's own page at future decode
    # offsets — decode overwrites them before they become visible, and the
    # kernel masks on seq_lens meanwhile.
    ps = k_pages.shape[2]
    P = k_pages.shape[1]
    chunk_pages = token_pages[:, ::ps]  # [B, n_chunks]
    if seqpar:
        # page-dim sharding (parallel/seqpar.py): P is the LOCAL pool size;
        # global page g belongs to shard g // P. Non-owned chunks (and the
        # 2**30 padding sentinel, whose owner index matches no shard) write
        # the shard's local garbage page 0.
        my_shard = lax.axis_index(tp_axis)
        chunk_pages = jnp.where(chunk_pages // P == my_shard,
                                chunk_pages % P, 0)
    else:
        chunk_pages = jnp.where(
            (chunk_pages < 0) | (chunk_pages >= P), 0, chunk_pages)
    n_chunks = chunk_pages.shape[1]
    # page-granular writes: n_full whole-page chunks stream through ONE
    # fori_loop of dynamic_update_slice ops (in place through the loop
    # carry), plus an unrolled partial tail when T is not a page multiple
    # (the engine buckets T to powers of two, so T >= ps is always a page
    # multiple in production — the tail exists for test-sized T).
    def layer_body(carry, layer_idx):
        x, kp_all, vp_all = carry  # cache in carry: aliases in place
        q, k, v, H, KH = _qkv(cfg, blocks, layer_idx, x, s, c, B, T)
        # causal self-attention over the prompt itself (rows independent)
        attn = attention_dense(q, k, v, positions, kv_mask)
        k2 = k.reshape(B, T, KH * hd).astype(kp_all.dtype)
        v2 = v.reshape(B, T, KH * hd).astype(vp_all.dtype)
        kp_all, vp_all = _write_chunk_pages(
            layer_idx, kp_all, vp_all, k2, v2, chunk_pages, ps)
        x = _mlp_residual(cfg, blocks, layer_idx, x, attn, B, T, H, hd,
                          tp_axis, wo_psum=not seqpar)
        return (x, kp_all, vp_all), None

    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    (x, k_pages, v_pages), _ = lax.scan(
        layer_body, (x, k_pages, v_pages), layer_ids
    )
    # only each row's final prompt token goes through the lm_head (the full
    # [B, T, vocab] fp32 logits tensor is ~1 GB at 7B long-prompt shapes
    # and its matmul is pure waste)
    x_last = jnp.take_along_axis(
        x, (prompt_lens - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    x_last = rmsnorm(x_last, params["final_norm"], cfg.norm_eps)
    last = linear(x_last, params["lm_head"]).astype(jnp.float32)
    if tp_axis and logits_all_gather:
        last = lax.all_gather(last, tp_axis, axis=-1, tiled=True)
    return last, k_pages, v_pages


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("k_pages", "v_pages"))
def prefill_paged(cfg: ModelConfig, params, tokens, prompt_lens,
                  k_pages, v_pages, token_pages, token_offs):
    """Single-device jit of prefill_paged_inner."""
    return prefill_paged_inner(cfg, params, tokens, prompt_lens,
                               k_pages, v_pages, token_pages, token_offs)


def prefill_chunk_paged_inner(cfg: ModelConfig, params, tokens_chunk,
                              chunk_start, row_lens, k_pages, v_pages,
                              chunk_pages, hist_pages, tp_axis=None,
                              logits_all_gather: bool = True,
                              seqpar: bool = False):
    """ONE C-token chunk of a chunked (incremental) prefill.

    Chunked prefill is how admission overlaps with decode (serving/engine.py
    interleaves one of these between decode chunks, so active slots never
    stall for a whole long-prompt prefill — the reference has no analogue,
    demo/main.cpp serves one request). Chunk tokens attend to (a) the
    sequence's PRIOR context, gathered from its already-written pages, and
    (b) the chunk itself, causally; the chunk's K/V is then written to its
    pages. All rows of the admission wave share the same chunk_start.

    tokens_chunk [B, C] (C a static multiple of the page size);
    chunk_start  scalar int32 — absolute position of chunk token 0;
    row_lens     [B] int32 prompt lengths (rows ending before chunk_start
                 are already complete: their writes go to the garbage page
                 via sentinel chunk_pages and their logits are not selected);
    chunk_pages  [B, C/ps] physical page per chunk page-slot (2**30 sentinel
                 for padding -> redirected to garbage page 0);
    hist_pages   [B, n_hist] pages of the prior context, n_hist STATIC
                 (callers bucket to limit compiles; pad entries read page 0
                 garbage and are masked via chunk_start/row_lens).

    Returns (last_logits [B, vocab] — logits at each row's final prompt
    token IF it falls in this chunk, else at a clamped slot (callers select
    via ends_here), ends_here [B] bool, k_pages, v_pages).
    """
    B, C = tokens_chunk.shape
    hd = cfg.head_dim
    ps = k_pages.shape[2]
    P = k_pages.shape[1]
    L = k_pages.shape[0]
    assert C % ps == 0, (C, ps)
    n_hist = hist_pages.shape[1]
    S_hist = n_hist * ps

    x = params["tok_emb"][tokens_chunk]
    sin, cos = build_rope(cfg)
    abs_pos = chunk_start + jnp.arange(C, dtype=jnp.int32)  # [C]
    abs_pos_b = jnp.broadcast_to(abs_pos, (B, C))
    s, c = gather_rope(sin, cos, jnp.minimum(abs_pos_b, cfg.seq_len - 1))

    if seqpar:
        # page-dim sharding (parallel/seqpar.py): P is the LOCAL pool
        # size; global page g belongs to shard g // P. Non-owned chunk
        # writes go to the local garbage page 0; non-owned HISTORY pages
        # read garbage and are masked out below — each shard scores only
        # ITS history slice, and the per-shard flash partials merge
        # exactly (no pool all-gather; r5, VERDICT r4 missing #3).
        my_shard = lax.axis_index(tp_axis)
        cp = jnp.where(chunk_pages // P == my_shard, chunk_pages % P, 0)
        hist_owned = (hist_pages // P == my_shard) & (hist_pages >= 0)
        hp = jnp.where(hist_owned, hist_pages % P, 0)
    else:
        cp = jnp.where((chunk_pages < 0) | (chunk_pages >= P), 0,
                       chunk_pages)
        hp = jnp.where((hist_pages < 0) | (hist_pages >= P), 0, hist_pages)

    # attention layout: [hist(S_hist) || chunk(C)]. Causality inside the
    # chunk uses LAYOUT positions (hist slots are always <= any chunk
    # query's layout position, which is exactly right: prior context is
    # fully visible); validity masks handle hist padding and row ends.
    q_layout_pos = S_hist + jnp.arange(C, dtype=jnp.int32)
    q_layout_pos = jnp.broadcast_to(q_layout_pos, (B, C))
    hist_limit = jnp.minimum(chunk_start, row_lens)  # [B]
    hist_valid = (jnp.arange(S_hist, dtype=jnp.int32)[None, :]
                  < hist_limit[:, None]) if S_hist else \
        jnp.zeros((B, 0), bool)
    chunk_valid = abs_pos[None, :] < row_lens[:, None]
    kv_mask = jnp.concatenate([hist_valid, chunk_valid], axis=1)

    blocks = params["blocks"]

    def layer_body(carry, layer_idx):
        x, kp_all, vp_all = carry
        q, k, v, H, KH = _qkv(cfg, blocks, layer_idx, x, s, c, B, C)
        k2 = k.reshape(B, C, KH * hd).astype(kp_all.dtype)
        v2 = v.reshape(B, C, KH * hd).astype(vp_all.dtype)
        kp_all, vp_all = _write_chunk_pages(
            layer_idx, kp_all, vp_all, k2, v2, cp, ps)
        if S_hist:
            # gather prior-context pages from the STACKED pool via a flat
            # page index (dynamic-slicing the layer first would materialize
            # a copy of the whole layer's pool)
            flat = layer_idx * P + hp  # [B, n_hist]
            k_hist = jnp.take(kp_all.reshape(L * P, ps, KH * hd), flat,
                              axis=0).reshape(B, S_hist, KH, hd)
            v_hist = jnp.take(vp_all.reshape(L * P, ps, KH * hd), flat,
                              axis=0).reshape(B, S_hist, KH, hd)
            if seqpar:
                # each shard scores ONLY the history pages it owns (its
                # gather of non-owned pages read garbage — masked here),
                # plus the replicated intra-chunk causal part computed
                # identically everywhere; one all_gather of the
                # B*C*H*(hd+2) flash stats merges everything exactly —
                # the same identity seqpar decode uses (parallel/seqpar.py)
                from ..ops.attention import attention_dense_parts
                from ..ops.pallas.paged_attention import merge_flash_many

                own_slots = jnp.repeat(hist_owned, ps, axis=1)  # [B, S_h]
                acc_h, m_h, l_h = attention_dense_parts(
                    q, k_hist.astype(k.dtype), v_hist.astype(v.dtype),
                    q_layout_pos, hist_valid & own_slots)
                rel_pos = jnp.broadcast_to(
                    jnp.arange(C, dtype=jnp.int32), (B, C))
                acc_c, m_c, l_c = attention_dense_parts(
                    q, k, v, rel_pos, chunk_valid)
                pa, pm, pl_ = lax.all_gather((acc_h, m_h, l_h), tp_axis)
                attn = merge_flash_many(
                    jnp.concatenate([pa, acc_c[None]], axis=0),
                    jnp.concatenate([pm, m_c[None]], axis=0),
                    jnp.concatenate([pl_, l_c[None]], axis=0),
                    axis=0).astype(q.dtype)
            else:
                k_all = jnp.concatenate([k_hist.astype(k.dtype), k], axis=1)
                v_all = jnp.concatenate([v_hist.astype(v.dtype), v], axis=1)
                attn = attention_dense(q, k_all, v_all, q_layout_pos,
                                       kv_mask)
        else:
            attn = attention_dense(q, k, v, q_layout_pos, kv_mask)
        x = _mlp_residual(cfg, blocks, layer_idx, x, attn, B, C, H, hd,
                          tp_axis, wo_psum=not seqpar)
        return (x, kp_all, vp_all), None

    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    (x, k_pages, v_pages), _ = lax.scan(
        layer_body, (x, k_pages, v_pages), layer_ids
    )
    # only each row's candidate last-token slot goes through the lm_head
    last_rel = jnp.clip(row_lens - 1 - chunk_start, 0, C - 1)  # [B]
    x_last = jnp.take_along_axis(x, last_rel[:, None, None], axis=1)[:, 0]
    x_last = rmsnorm(x_last, params["final_norm"], cfg.norm_eps)
    logits = linear(x_last, params["lm_head"]).astype(jnp.float32)
    if tp_axis and logits_all_gather:
        logits = lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    ends_here = ((row_lens - 1 >= chunk_start)
                 & (row_lens - 1 < chunk_start + C))
    return logits, ends_here, k_pages, v_pages


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("k_pages", "v_pages"))
def prefill_chunk_paged(cfg: ModelConfig, params, tokens_chunk, chunk_start,
                        row_lens, k_pages, v_pages, chunk_pages, hist_pages):
    """Single-device jit of prefill_chunk_paged_inner (n_hist is static via
    the hist_pages shape; callers bucket it)."""
    return prefill_chunk_paged_inner(
        cfg, params, tokens_chunk, chunk_start, row_lens, k_pages, v_pages,
        chunk_pages, hist_pages)


def decode_chunk_paged_inner(cfg: ModelConfig, params, token, pos,
                             k_pages, v_pages, done, rng, stop_ids,
                             page_table_dev, flat_b, flat_page, flat_tok0,
                             n_items, steps: int, page_size: int = 128,
                             temperature: float = 0.0, top_k: int = 0,
                             top_p: float = 1.0, tp_axis=None,
                             seqpar: bool = False, covered=None):
    """Run `steps` decode iterations over the paged cache.

    token/pos/done: [B] current state. page_table_dev: [B, max_pages] int32
    (device copy for locating the write page of each new token). The flat_*
    work list must cover each row's pages up to pos+steps (pre-extended by
    the scheduler); unwritten tail slots are masked via seq_lens = pos+1.
    Under tensor parallelism (tp_axis set, see parallel/sharded_paged.py)
    pages/weights are local shards, the work list is replicated, and logits
    are all-gathered before sampling so every shard samples the same token.

    seqpar=True (tp_axis required; see parallel/seqpar.py): the pools are
    sharded over the PAGE dim instead of lanes. Every shard computes the
    full q/k/v (attention weights replicated), writes only the pages it
    owns (global page g belongs to shard g // P_local; non-owned writes go
    to the shard's local garbage page 0), runs the flash kernel over ITS
    pages via a per-shard work list, and the partial (acc, m, l) stats are
    all-gathered and merged exactly (merge_flash_many). `covered` [B] bool
    marks rows this shard's work list touches — uncovered rows' kernel
    outputs are never written and are neutralized before the merge.
    Returns (tokens [B, steps], token, pos, k_pages, v_pages, done, rng).
    """
    B = token.shape[0]
    hd = cfg.head_dim
    sin, cos = build_rope(cfg)
    b_idx = jnp.arange(B, dtype=jnp.int32)
    blocks = params["blocks"]
    if seqpar:
        assert tp_axis is not None and covered is not None
        my_shard = lax.axis_index(tp_axis)
        P_local = k_pages.shape[1]

    def step(carry, _):
        token, pos, k_pages, v_pages, done, rng = carry
        x = params["tok_emb"][token][:, None]  # [B, 1, dim]
        s, c = gather_rope(sin, cos, pos[:, None])
        seq_lens = pos + 1
        write_page = page_table_dev[b_idx, pos // page_size]
        write_off = pos % page_size
        if seqpar:
            # ownership redirect: non-owned writes target the local garbage
            # page 0 (reserved on every shard by the allocator)
            write_page = jnp.where(write_page // P_local == my_shard,
                                   write_page % P_local, 0)

        def layer_body(carry, layer_idx):
            x, kp_all, vp_all = carry
            q, k, v, H, KH = _qkv(cfg, blocks, layer_idx, x, s, c, B, 1)
            # append each row's new token K/V: pool layout [L, P, ps, KH*hd]
            # puts tokens on sublanes, so this is ONE contiguous
            # dynamic_update_slice per row into the FULL stacked pool —
            # in place through the scan carry (a scatter here copy-inserts
            # the whole pool per layer; see kvcache.py). Retired slots'
            # page_table rows are 0 = the reserved garbage page.
            if not _DEBUG_SKIP_WRITES:
                k2 = k.reshape(B, 1, 1, KH * hd).astype(kp_all.dtype)
                v2 = v.reshape(B, 1, 1, KH * hd).astype(vp_all.dtype)
                for b in range(B):
                    start = (layer_idx, write_page[b], write_off[b],
                             jnp.zeros((), jnp.int32))
                    kp_all = lax.dynamic_update_slice(kp_all, k2[b][None],
                                                      start)
                    vp_all = lax.dynamic_update_slice(vp_all, v2[b][None],
                                                      start)
            acc, m, l = paged_attention_flat(
                q[:, 0], kp_all, vp_all, flat_b, flat_page, flat_tok0,
                n_items, seq_lens, page_size=page_size, layer_idx=layer_idx,
            )
            if seqpar:
                from ..ops.pallas.paged_attention import merge_flash_many

                # uncovered rows were never written by the kernel:
                # neutralize to the flash identity before the exact merge
                cov = covered[:, None]
                acc = jnp.where(cov[..., None], acc, 0.0)
                m = jnp.where(cov, m, -1e30)
                l = jnp.where(cov, l, 0.0)
                parts = lax.all_gather((acc, m, l), tp_axis)  # [sp, ...]
                attn = merge_flash_many(*parts, axis=0).astype(x.dtype)
            else:
                attn = (acc / jnp.maximum(l[..., None], 1e-30)).astype(x.dtype)
            x = _mlp_residual(cfg, blocks, layer_idx, x, attn[:, None], B, 1,
                              H, hd, tp_axis, wo_psum=not seqpar)
            return (x, kp_all, vp_all), None

        layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        (x, k_pages, v_pages), _ = lax.scan(
            layer_body, (x, k_pages, v_pages), layer_ids
        )
        x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
        logits = linear(x[:, 0], params["lm_head"]).astype(jnp.float32)
        if tp_axis:
            logits = lax.all_gather(logits, tp_axis, axis=-1, tiled=True)

        rng, sub = jax.random.split(rng)
        nxt = sample_token(logits, sub, temperature, top_k, top_p)
        nxt = jnp.where(done, token, nxt)
        new_done = done | jnp.any(nxt[:, None] == stop_ids[None, :], axis=-1)
        new_pos = jnp.where(done, pos, pos + 1)
        return (nxt, new_pos, k_pages, v_pages, new_done, rng), nxt

    (token, pos, k_pages, v_pages, done, rng), toks = lax.scan(
        step, (token, pos, k_pages, v_pages, done, rng), length=steps
    )
    return jnp.transpose(toks), token, pos, k_pages, v_pages, done, rng


@partial(
    jax.jit,
    static_argnames=("cfg", "steps", "page_size", "temperature", "top_k", "top_p"),
    donate_argnames=("k_pages", "v_pages"),
)
def decode_chunk_paged(cfg: ModelConfig, params, token, pos, k_pages, v_pages,
                       done, rng, stop_ids, page_table_dev,
                       flat_b, flat_page, flat_tok0, n_items,
                       steps: int, page_size: int = 128,
                       temperature: float = 0.0, top_k: int = 0,
                       top_p: float = 1.0):
    """Single-device jit of decode_chunk_paged_inner."""
    return decode_chunk_paged_inner(
        cfg, params, token, pos, k_pages, v_pages, done, rng, stop_ids,
        page_table_dev, flat_b, flat_page, flat_tok0, n_items,
        steps=steps, page_size=page_size, temperature=temperature,
        top_k=top_k, top_p=top_p,
    )


def pack_chunk_meta(pt, fb, fp, ft, ni):
    """Pack the per-chunk scheduler arrays (page table + flat work list)
    into ONE int32 vector. Rationale: through the axon tunnel every
    host->device transfer costs ~15-25 ms of latency regardless of size;
    the engine uploads 5 tiny arrays per decode chunk, which measured as
    the bulk of its 16% tax over raw batched decode (r5, /tmp engtax A/B:
    chunk size and kernel choice were both flat). One packed upload +
    free on-device slicing removes 4 of the 5."""
    import numpy as np

    return np.concatenate([
        np.asarray(pt, np.int32).ravel(), np.asarray(fb, np.int32),
        np.asarray(fp, np.int32), np.asarray(ft, np.int32),
        np.asarray([int(ni)], np.int32)])


@partial(
    jax.jit,
    static_argnames=("cfg", "shapes", "steps", "page_size", "temperature",
                     "top_k", "top_p"),
    donate_argnames=("k_pages", "v_pages"),
)
def decode_chunk_paged_packed(cfg: ModelConfig, params, token, pos, k_pages,
                              v_pages, done, rng, stop_ids, packed, shapes,
                              steps: int, page_size: int = 128,
                              temperature: float = 0.0, top_k: int = 0,
                              top_p: float = 1.0):
    """decode_chunk_paged with the scheduler metadata arriving as ONE
    packed int32 vector (see pack_chunk_meta); shapes = (B, max_pages, M)
    static. The unpack slices are free inside the jit."""
    B, MP, M = shapes
    pt = packed[: B * MP].reshape(B, MP)
    o = B * MP
    fb = packed[o: o + M]
    fp = packed[o + M: o + 2 * M]
    ft = packed[o + 2 * M: o + 3 * M]
    ni = packed[o + 3 * M: o + 3 * M + 1]  # [1], the kernel's prefetch shape
    return decode_chunk_paged_inner(
        cfg, params, token, pos, k_pages, v_pages, done, rng, stop_ids,
        pt, fb, fp, ft, ni,
        steps=steps, page_size=page_size, temperature=temperature,
        top_k=top_k, top_p=top_p,
    )

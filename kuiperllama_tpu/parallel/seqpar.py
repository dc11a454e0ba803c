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

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.pallas.paged_attention import (merge_flash_many,
                                          paged_attention_flat)
from .mesh import MODEL_AXIS


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

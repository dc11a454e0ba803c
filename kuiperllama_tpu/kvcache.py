"""Paged KV cache.

Replaces the reference's dense preallocated [L, seq_len, kv_dim] fp32 block
(kuiper/source/model/llama3.cpp:469-475) with a paged pool: fixed-size pages
allocated to sequences on demand, so memory scales with actual tokens, not
max_seqs x max_len, and long-context attention reads only real pages
(flash-decode kernel in ops/pallas/paged_attention.py).

Layout:
  k_pages, v_pages: [L, n_pages, page_size, KH*hd]
Tokens live on the SUBLANE dim, kv heads head-major on the LANE dim
(token t of kv head h at [li, page, t % ps, h*hd : (h+1)*hd]). This makes a
decode step's append ONE contiguous dynamic_update_slice per sequence —
which XLA keeps in place through a scan carry. The obvious alternatives all
lose: a lane-scattered token layout needs a jnp scatter, and a scatter
whose result feeds a pallas_call gets copy-inserted (measured: full-pool
copy per layer per step, 26x on the 7B engine); a [.., KH*ps, hd] layout is
un-DMA-able when head_dim=64 (TinyLlama/Qwen2.5-0.5B — Mosaic requires the
minor dim 128-aligned) while KH*hd is a 128-multiple for every family
UNSHARDED. Head-major lanes also keep the pool shardable over kv heads for
tensor parallelism (parallel/sharded_paged.py) — but a shard's lane block is
(KH/tp)*hd, which must itself stay 128-aligned: hd=64 families support tp
only up to KH*hd/128, enforced by parallel/shardings.validate_tp.

Page 0 is a reserved garbage sink: writes for padding rows or retired slots
target page 0 instead of needing scatter drop semantics (DUS clamps
out-of-range starts, so a 2**30 sentinel would silently corrupt the last
real page). The allocator never hands out page 0.

The page table [max_seqs, max_pages_per_seq] int32 and seq_lens [max_seqs]
live on host (the scheduler owns them) and ship to device per step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .config import ModelConfig


@dataclass
class PagedKVCache:
    k_pages: jax.Array  # [L, P, ps, KH*hd]
    v_pages: jax.Array  # [L, P, ps, KH*hd]
    page_size: int

    @property
    def n_pages(self) -> int:
        return self.k_pages.shape[1]


def init_paged_cache(cfg: ModelConfig, n_pages: int, page_size: int = 128,
                     dtype=jnp.bfloat16, n_kv_heads: Optional[int] = None
                     ) -> PagedKVCache:
    KH = n_kv_heads or cfg.n_kv_heads
    hd = cfg.head_dim
    shape = (cfg.n_layers, n_pages, page_size, KH * hd)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, dtype),
        v_pages=jnp.zeros(shape, dtype),
        page_size=page_size,
    )


class PageAllocator:
    """Host-side free-list page allocator + page tables (the scheduler's
    bookkeeping; nothing here touches the device). Page 0 is reserved as
    the garbage sink (see module docstring) and is never allocated.

    `reserved` extends the reserved set (page 0 is always included): under
    sequence-parallel page-dim sharding (parallel/seqpar.py) every shard
    needs its own local garbage sink, so pages {s * P/sp} — local index 0
    of each shard — are reserved too."""

    def __init__(self, n_pages: int, page_size: int, max_seqs: int,
                 max_len: int, reserved=()):
        self.page_size = page_size
        self.max_pages_per_seq = -(-max_len // page_size)
        self.reserved = {0} | set(reserved)
        self.free: List[int] = [p for p in range(1, n_pages)
                                if p not in self.reserved]
        self.page_table = np.zeros((max_seqs, self.max_pages_per_seq), np.int32)
        self.seq_lens = np.zeros((max_seqs,), np.int32)
        self.owned: dict[int, List[int]] = {}

    @property
    def n_free_pages(self) -> int:
        return len(self.free)

    def pages_needed(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def alloc_seq(self, slot: int, n_tokens: int) -> bool:
        """Reserve pages for a sequence of n_tokens in `slot`. False if OOM."""
        need = self.pages_needed(max(n_tokens, 1))
        if need > len(self.free):
            return False
        pages = [self.free.pop() for _ in range(need)]
        self.owned[slot] = pages
        self.page_table[slot, :need] = pages
        self.seq_lens[slot] = n_tokens
        return True

    def extend_seq(self, slot: int, new_len: int) -> bool:
        """Grow a sequence; allocates a page when it crosses a boundary."""
        have = len(self.owned[slot])
        need = self.pages_needed(new_len)
        while have < need:
            if not self.free:
                return False
            p = self.free.pop()
            self.owned[slot].append(p)
            self.page_table[slot, have] = p
            have += 1
        self.seq_lens[slot] = new_len
        return True

    def free_seq(self, slot: int):
        for p in self.owned.pop(slot, []):
            self.free.append(p)
        self.page_table[slot] = 0  # page 0 = garbage sink for stale writes
        self.seq_lens[slot] = 0


def write_tokens_paged(cache: PagedKVCache, k_new, v_new, slot_pages, offsets):
    """Write new K/V into pages via per-token dynamic_update_slice (in-place
    under jit when the pools are donated/carried).

    Decode/test-scale ONLY: the double Python loop unrolls 2*B*T DUS ops at
    trace time — pathological compile time and HLO size at prefill-sized T.
    The production prefill write path is the page-granular fori_loop in
    models/paged.prefill_paged_inner; decode's per-token appends live in
    models/paged.decode_chunk_paged_inner.

    k_new/v_new: [L, B, T, KH, hd] from the layer forward.
    slot_pages:  [B, T] int32 physical page per token; out-of-range values
                 (e.g. a 2**30 padding sentinel) are redirected to the
                 reserved garbage page 0.
    offsets:     [B, T] int32 in-page offset per token.
    """
    L, B, T, KH, hd = k_new.shape
    kp, vp = cache.k_pages, cache.v_pages
    P = kp.shape[1]
    pages = jnp.where((slot_pages < 0) | (slot_pages >= P), 0, slot_pages)
    kn = k_new.reshape(L, B, T, KH * hd).astype(kp.dtype)
    vn = v_new.reshape(L, B, T, KH * hd).astype(vp.dtype)
    zero = jnp.zeros((), jnp.int32)
    for b in range(B):
        for t in range(T):
            start = (zero, pages[b, t], offsets[b, t], zero)
            upd_k = kn[:, b, t].reshape(L, 1, 1, KH * hd)
            upd_v = vn[:, b, t].reshape(L, 1, 1, KH * hd)
            kp = lax.dynamic_update_slice(kp, upd_k, start)
            vp = lax.dynamic_update_slice(vp, upd_v, start)
    return PagedKVCache(kp, vp, cache.page_size)

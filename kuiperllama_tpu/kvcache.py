"""Paged KV cache.

Replaces the reference's dense preallocated [L, seq_len, kv_dim] fp32 block
(kuiper/source/model/llama3.cpp:469-475) with a paged pool: fixed-size pages
allocated to sequences on demand, so memory scales with actual tokens, not
max_seqs x max_len, and long-context attention reads only real pages
(flash-decode kernel in ops/pallas/paged_attention.py).

Layout (matches ops/pallas/paged_attention.py's matmul dims — all kv heads
of a page contract in ONE MXU call):
  k_pages, v_pages: [L, n_pages, hd, KH*page_size]
One (layer, page) block across all kv heads is contiguous and is the DMA
unit of the decode kernel (per-head DMAs are latency-bound). Tokens live on
the LANE dimension for BOTH K and V — Mosaic requires a DMA'd ref's minor
dim to be 128-aligned and head_dim is only 64 on TinyLlama/Qwen2.5-0.5B, so
a [.., KH*ps, hd] V layout would be un-DMA-able; the kernel's p @ v matmul
contracts over lanes instead. A token at (kv head h, in-page offset o) sits
at lane h*page_size + o. The page table [max_seqs, max_pages_per_seq] int32
and seq_lens [max_seqs] live on host (the scheduler owns them) and ship to
device per step as scalars.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig


@dataclass
class PagedKVCache:
    k_pages: jax.Array  # [L, P, hd, KH*ps]
    v_pages: jax.Array  # [L, P, hd, KH*ps]
    page_size: int

    @property
    def n_pages(self) -> int:
        return self.k_pages.shape[1]


def init_paged_cache(cfg: ModelConfig, n_pages: int, page_size: int = 128,
                     dtype=jnp.bfloat16, n_kv_heads: Optional[int] = None
                     ) -> PagedKVCache:
    KH = n_kv_heads or cfg.n_kv_heads
    hd = cfg.head_dim
    shape = (cfg.n_layers, n_pages, hd, KH * page_size)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, dtype),
        v_pages=jnp.zeros(shape, dtype),
        page_size=page_size,
    )


class PageAllocator:
    """Host-side free-list page allocator + page tables (the scheduler's
    bookkeeping; nothing here touches the device)."""

    def __init__(self, n_pages: int, page_size: int, max_seqs: int,
                 max_len: int):
        self.page_size = page_size
        self.max_pages_per_seq = -(-max_len // page_size)
        self.free: List[int] = list(range(n_pages))
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
        self.page_table[slot] = 0
        self.seq_lens[slot] = 0


def write_tokens_paged(cache: PagedKVCache, k_new, v_new, slot_pages, offsets):
    """Scatter new K/V into pages.

    k_new/v_new: [L, B, T, KH, hd] from the layer forward.
    slot_pages:  [B, T] int32 physical page per token; use a LARGE positive
                 sentinel (e.g. 2**30) for masked tokens — mode="drop" only
                 drops out-of-bounds indices, and negative values wrap.
    offsets:     [B, T] int32 in-page offset per token.
    """
    L, B, T, KH, hd = k_new.shape
    ps = cache.page_size
    pages = slot_pages.reshape(B * T)
    # lane index of (kv head h, in-page offset o) is h*ps + o
    lanes = (jnp.arange(KH, dtype=jnp.int32)[None, :] * ps
             + offsets.reshape(B * T)[:, None])  # [B*T, KH]
    # pages [L, P, hd, KH*ps]: advanced indices at dims 1 and 3
    # (non-adjacent -> result dims lead): [B*T, KH, L, hd]
    kn = jnp.transpose(k_new, (1, 2, 3, 0, 4)).reshape(B * T, KH, L, hd)
    vn = jnp.transpose(v_new, (1, 2, 3, 0, 4)).reshape(B * T, KH, L, hd)
    k_pages = cache.k_pages.at[:, pages[:, None], :, lanes].set(
        kn.astype(cache.k_pages.dtype), mode="drop"
    )
    v_pages = cache.v_pages.at[:, pages[:, None], :, lanes].set(
        vn.astype(cache.v_pages.dtype), mode="drop"
    )
    return PagedKVCache(k_pages, v_pages, cache.page_size)

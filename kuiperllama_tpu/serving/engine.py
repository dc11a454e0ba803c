"""Continuous-batching serving engine.

The reference serves exactly one request with a hand-rolled loop
(demo/main.cpp:5-75). This engine maintains a slot-per-request batch over a
persistent KV cache: requests are admitted into free slots (prefill writes
that slot's cache), all active slots decode together in scan chunks,
finished rows retire and free their slot for the next queued request —
decode never stops for admissions.

Two cache backends:
  Engine      — dense cache [L, max_batch, max_len, KH, hd] (simple, great
                for short contexts);
  PagedEngine — paged pool + flash-decode kernel (memory scales with real
                tokens; long context / big batches).

Host/device split: the device owns tokens/positions/done flags and the KV
cache (donated across chunks); the host owns the request queue, the page
allocator, and consumes chunk outputs (one D2H fetch per chunk, not per
token — the reference pays a sync per token, argmax_kernel.cu:80-84).
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import decoder
from ..ops.sampling import sample_token
from .generate import _bucket, _stop_array, decode_chunk


@dataclass
class Request:
    prompt_ids: List[int]
    max_new_tokens: int = 128
    request_id: int = field(default_factory=itertools.count().__next__)
    # filled by the engine:
    out_ids: List[int] = field(default_factory=list)
    submit_time: float = 0.0
    first_token_time: float = 0.0
    finish_time: float = 0.0

    @property
    def ttft_s(self) -> float:
        return self.first_token_time - self.submit_time

    @property
    def finished(self) -> bool:
        return self.finish_time > 0


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv_cache",))
def _admit_prefill(cfg: ModelConfig, params, tokens, n_tokens, slot, kv_cache,
                   rng, stop_ids):
    """Prefill one request's [1, T] prompt into dense-cache slot `slot`.

    Returns (first_token [], done flag [], kv_cache).
    """
    row_cache = dict(
        k=jax.lax.dynamic_slice_in_dim(kv_cache["k"], slot, 1, axis=1),
        v=jax.lax.dynamic_slice_in_dim(kv_cache["v"], slot, 1, axis=1),
    )
    last, row_cache = decoder.prefill(
        cfg, params, tokens, row_cache, prompt_lens=n_tokens[None]
    )
    kv_cache = dict(
        k=jax.lax.dynamic_update_slice_in_dim(kv_cache["k"], row_cache["k"], slot, axis=1),
        v=jax.lax.dynamic_update_slice_in_dim(kv_cache["v"], row_cache["v"], slot, axis=1),
    )
    token = sample_token(last, rng)[0]
    done = jnp.any(token == stop_ids)
    return token, done, kv_cache


class Engine:
    """Continuous batching over `max_batch` dense cache slots."""

    def __init__(self, cfg: ModelConfig, params, tokenizer=None,
                 max_batch: int = 8, max_len: Optional[int] = None,
                 cache_dtype=jnp.bfloat16, chunk: int = 32,
                 temperature: float = 0.0, top_k: int = 0, top_p: float = 1.0,
                 stop_ids=frozenset(), seed: int = 0):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_batch = max_batch
        self.max_len = max_len or cfg.seq_len
        self.cache_dtype = cache_dtype
        self.chunk = chunk
        self.temperature, self.top_k, self.top_p = temperature, top_k, top_p
        stop = set(stop_ids)
        if tokenizer is not None:
            stop |= set(tokenizer.stop_ids)
        self.stop_ids = {int(s) for s in stop if int(s) >= 0}
        self._stop_arr = _stop_array(self.stop_ids)

        self.token = jnp.zeros((max_batch,), jnp.int32)
        self.pos = jnp.zeros((max_batch,), jnp.int32)
        self.done = jnp.ones((max_batch,), bool)  # all slots free
        self.rng = jax.random.PRNGKey(seed)

        self.queue: List[Request] = []
        self.active: Dict[int, Request] = {}  # slot -> request
        self._slot_budget: Dict[int, int] = {}
        self._init_cache()

    # ---- cache backend hooks (overridden by PagedEngine)

    def _init_cache(self):
        self.cache = decoder.init_kv_cache(
            self.cfg, batch=self.max_batch, max_len=self.max_len,
            dtype=self.cache_dtype,
        )

    def _can_admit(self, req: Request) -> bool:
        return True

    def _prefill_slot(self, slot: int, toks: np.ndarray, n: int, rng):
        first, done, self.cache = _admit_prefill(
            self.cfg, self.params, jnp.asarray(toks),
            jnp.int32(n), jnp.int32(slot), self.cache, rng, self._stop_arr,
        )
        return first, done

    def _run_chunk(self):
        toks, self.token, self.pos, self.cache, self.done, self.rng = decode_chunk(
            self.cfg, self.params, self.token, self.pos, self.cache,
            self.done, self.rng, self._stop_arr, steps=self.chunk,
            temperature=self.temperature, top_k=self.top_k, top_p=self.top_p,
        )
        return toks

    def _retire_slot(self, slot: int):
        pass

    def _slot_capacity(self, slot: int) -> int:
        return self.max_len

    # ---- public API

    def submit(self, req: Request):
        req.submit_time = time.perf_counter()
        self.queue.append(req)

    def submit_prompt(self, text: str, **kw) -> Request:
        assert self.tokenizer is not None
        req = Request(prompt_ids=self.tokenizer.encode(text), **kw)
        self.submit(req)
        return req

    @property
    def n_active(self) -> int:
        return len(self.active)

    @property
    def has_work(self) -> bool:
        return bool(self.queue or self.active)

    def run(self, requests: Sequence[Request] = ()) -> List[Request]:
        """Drain: submit `requests`, step until everything finishes."""
        for r in requests:
            self.submit(r)
        finished = []
        while self.has_work:
            finished.extend(self.step())
        return finished

    # ---- engine internals

    def step(self) -> List[Request]:
        """Admit as many queued requests as fit, run one decode chunk,
        retire finished rows. Returns newly finished requests."""
        self._admit()
        if not self.active:
            return []
        toks = self._run_chunk()
        return self._collect(np.asarray(toks))

    def _free_slots(self) -> List[int]:
        return [s for s in range(self.max_batch) if s not in self.active]

    def _admit(self):
        free = self._free_slots()
        while self.queue and free and self._can_admit(self.queue[0]):
            req = self.queue.pop(0)
            slot = free.pop(0)
            n = len(req.prompt_ids)
            assert 1 <= n < self.max_len, (n, self.max_len)
            T = min(_bucket(n), self.max_len)
            toks = np.zeros((1, T), np.int32)
            toks[0, :n] = req.prompt_ids
            self.rng, sub = jax.random.split(self.rng)
            first, done = self._prefill_slot(slot, toks, n, sub)
            first_id = int(first)  # syncs the prefill
            req.first_token_time = time.perf_counter()
            self.token = self.token.at[slot].set(first)
            self.pos = self.pos.at[slot].set(n)
            self.done = self.done.at[slot].set(done)
            self.active[slot] = req
            if first_id in self.stop_ids:
                req.finish_time = time.perf_counter()
                self._slot_budget[slot] = 0
            else:
                req.out_ids.append(first_id)
                self._slot_budget[slot] = req.max_new_tokens - 1

    def _collect(self, toks: np.ndarray) -> List[Request]:
        finished = []
        done_np = np.asarray(self.done)
        pos_np = np.asarray(self.pos)
        for slot, req in list(self.active.items()):
            if req.finished:  # finished during admit
                self._retire_slot(slot)
                finished.append(req)
                del self.active[slot]
                continue
            budget = self._slot_budget[slot]
            row = toks[slot]
            taken = 0
            hit_stop = False
            for t in row:
                if taken >= budget:
                    break
                t = int(t)
                if t in self.stop_ids:
                    hit_stop = True
                    break
                req.out_ids.append(t)
                taken += 1
            self._slot_budget[slot] = budget - taken
            out_of_budget = self._slot_budget[slot] <= 0
            capacity = int(pos_np[slot]) >= self._slot_capacity(slot) - 1
            if hit_stop or out_of_budget or capacity or bool(done_np[slot]):
                req.finish_time = time.perf_counter()
                self._retire_slot(slot)
                finished.append(req)
                del self.active[slot]
                # free the slot for the next admit
                self.done = self.done.at[slot].set(True)
        return finished


class PagedEngine(Engine):
    """Continuous batching over a paged KV cache + flash-decode kernel."""

    def __init__(self, cfg: ModelConfig, params, tokenizer=None,
                 n_pages: Optional[int] = None, page_size: int = 128,
                 **kw):
        from ..kvcache import PageAllocator, init_paged_cache

        self.page_size = page_size
        max_batch = kw.get("max_batch", 8)
        max_len = kw.get("max_len") or cfg.seq_len
        if n_pages is None:
            n_pages = max_batch * (-(-max_len // page_size)) + 1
        self._n_pages = n_pages
        self._alloc_cls = PageAllocator
        self._init_paged = init_paged_cache
        super().__init__(cfg, params, tokenizer, **kw)
        self.allocator = PageAllocator(
            n_pages=n_pages, page_size=page_size,
            max_seqs=self.max_batch, max_len=self.max_len,
        )

    def _init_cache(self):
        cache = self._init_paged(
            self.cfg, n_pages=self._n_pages, page_size=self.page_size,
            dtype=self.cache_dtype,
        )
        self.k_pages, self.v_pages = cache.k_pages, cache.v_pages

    def _can_admit(self, req: Request) -> bool:
        need = -(-len(req.prompt_ids) // self.page_size)
        return self.allocator.n_free_pages >= need

    def _prefill_slot(self, slot: int, toks: np.ndarray, n: int, rng):
        from ..models.paged import prefill_paged

        ok = self.allocator.alloc_seq(slot, n)
        assert ok, "page allocator OOM on admission (checked by _can_admit)"
        T = toks.shape[1]
        ps = self.page_size
        # OOB sentinel for padding rows: mode="drop" drops indices >= P,
        # but NEGATIVE indices wrap pythonically and would corrupt pages
        token_pages = np.full((T,), 2**30, np.int32)
        token_offs = np.zeros((T,), np.int32)
        for p in range(n):
            token_pages[p] = self.allocator.page_table[slot, p // ps]
            token_offs[p] = p % ps
        last, self.k_pages, self.v_pages = prefill_paged(
            self.cfg, self.params, jnp.asarray(toks), jnp.int32(n),
            self.k_pages, self.v_pages,
            jnp.asarray(token_pages), jnp.asarray(token_offs),
        )
        token = sample_token(last, rng)[0]
        done = jnp.any(token == self._stop_arr)
        return token, done

    def _run_chunk(self):
        from ..models.paged import decode_chunk_paged
        from ..ops.pallas.paged_attention import build_work_list

        # pre-extend every active sequence's pages to cover the chunk
        pos_np = np.asarray(self.pos)
        for slot in self.active:
            target = min(int(pos_np[slot]) + self.chunk + 1, self.max_len)
            ok = self.allocator.extend_seq(slot, target)
            assert ok, "page allocator OOM mid-decode (capacity sizing bug)"
        fb, fp, ft, n_items = build_work_list(
            self.allocator.page_table, self.allocator.seq_lens, self.page_size
        )
        (toks, self.token, self.pos, self.k_pages, self.v_pages,
         self.done, self.rng) = decode_chunk_paged(
            self.cfg, self.params, self.token, self.pos,
            self.k_pages, self.v_pages, self.done, self.rng, self._stop_arr,
            jnp.asarray(self.allocator.page_table),
            jnp.asarray(fb), jnp.asarray(fp), jnp.asarray(ft),
            jnp.asarray(n_items),
            steps=self.chunk, page_size=self.page_size,
            temperature=self.temperature, top_k=self.top_k, top_p=self.top_p,
        )
        return toks

    def _retire_slot(self, slot: int):
        self.allocator.free_seq(slot)

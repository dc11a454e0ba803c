"""Generation loops (reference demo/main.cpp `generate`), TPU-native.

Differences from the reference, by design:
  * prefill is ONE batched forward over the whole prompt (the reference
    re-runs its single-token path per prompt token, demo/main.cpp:18-41);
  * decode runs as `lax.scan` chunks of N steps inside a single jit call,
    sampling on device — the reference pays a device->host sync per token
    (argmax_kernel.cu:80-84); here tokens cross to the host once per chunk;
  * stop-token handling is on-device: a `done` flag freezes finished rows,
    the host truncates after fetching the chunk;
  * KV cache buffers are donated between chunks (no copy growth).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import decoder
from ..ops.sampling import sample_token

MAX_STOP_IDS = 8


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _stop_array(stop_ids) -> jnp.ndarray:
    ids = sorted(set(int(i) for i in stop_ids))[:MAX_STOP_IDS]
    arr = np.full((MAX_STOP_IDS,), -1, np.int32)
    arr[: len(ids)] = ids
    return jnp.asarray(arr)


def _bucket_len(n: int, quantum: int = 256) -> int:
    return -(-n // quantum) * quantum


@partial(
    jax.jit,
    static_argnames=("cfg", "steps", "temperature", "top_k", "top_p",
                     "forward_fn", "active_len", "fused"),
    donate_argnames=("kv_cache",),
)
def decode_chunk(cfg: ModelConfig, params, token, pos, kv_cache, done, rng,
                 stop_ids, steps: int, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0, forward_fn=None,
                 active_len: int = 0, fused: bool = False):
    """Run `steps` decode iterations on device.

    token: [B] int32 current token; pos: [B] int32 its position.
    done:  [B] bool rows already finished (their cache/pos stay frozen).
    active_len: static cap on the cache slots the attention reads this chunk
      (0 = all). Dense attention reads the WHOLE allocated cache every step
      (XLA cannot know only 0..pos is live — masking happens after the read);
      at Llama-2-7B geometry a 2048-slot bf16 cache is 4.3 GB/step of HBM
      traffic against 7 GB of weights. Callers pass a bucketed
      max(pos)+steps+1 so early decode reads only what exists; the chunk
      slices the cache once, scans, and writes the slice back (donated, so
      the full buffer updates in place).
    Returns (tokens [B, steps], token, pos, kv_cache, done, rng).
    Emitted tokens after a row finishes repeat the stop token.
    """
    S = kv_cache["k"].shape[2]
    sliced = bool(active_len) and active_len < S
    cache = kv_cache
    if sliced:
        cache = dict(
            k=jax.lax.slice_in_dim(kv_cache["k"], 0, active_len, axis=2),
            v=jax.lax.slice_in_dim(kv_cache["v"], 0, active_len, axis=2),
        )

    import os as _os

    _small = False
    if fused:
        from ..ops.pallas.fused_decode import fits_vmem as _fits_small
        from ..ops.pallas.fused_decode_big import fits_vmem_big as _fits_big

        alen = active_len if (bool(active_len) and active_len < S) else S
        _small = _fits_small(params["blocks"], kv_cache["k"].dtype, alen)
        _big_on = _os.environ.get("KT_FUSED_BIG", "0") == "1"
        if not _small and not (_big_on and _fits_big(
                params["blocks"], kv_cache["k"].dtype, alen)):
            fused = False  # this chunk's cache slab outgrew both plans

    if (fused and _small and temperature <= 0.0 and top_k == 0
            and top_p >= 1.0
            and _os.environ.get("KT_FUSED_CHUNK") == "1"):
        # greedy chunk megakernel: ALL `steps` iterations in ONE
        # pallas_call — lm_head, argmax and the next token's embedding
        # fetch happen in-kernel, so there are zero per-step launch
        # boundaries (ops/pallas/fused_decode.fused_decode_chunk).
        # OPT-IN (KT_FUSED_CHUNK=1, process-start-only like the KT_*
        # knobs): the r4 A/B showed it TIES the single-step megakernel at
        # TinyLlama/Qwen (507 / 553 tok/s) but LOSES at Llama-3.2-1B
        # (374 vs 435 — its 263 MB lm_head streams slower through the
        # in-kernel vocab tiles than through the tuned standalone diag
        # kernel), so the default path is megakernel + outside lm_head.
        from ..models.decoder import build_rope
        from ..ops.pallas.fused_decode import fused_decode_chunk

        L, B1, A, KH, hd = cache["k"].shape
        assert B1 == 1, "fused decode is a B=1 latency path"
        x0 = params["tok_emb"][token]  # [1, d]
        kc = cache["k"].reshape(L, A, KH * hd)
        vc = cache["v"].reshape(L, A, KH * hd)
        sin, cos = build_rope(cfg)
        toks1, kc, vc = fused_decode_chunk(
            cfg, params, x0, kc, vc, pos[0], sin, cos, steps)
        cache = dict(k=kc.reshape(L, 1, A, KH, hd),
                     v=vc.reshape(L, 1, A, KH, hd))
        token = toks1[-1:]
        pos = pos + steps
        done = done | jnp.any(toks1[:, None] == stop_ids[None, :])
        toks = toks1[:, None]  # [steps, B=1] (matches the scan's ys)
        if sliced:
            kv_cache = dict(
                k=jax.lax.dynamic_update_slice_in_dim(
                    kv_cache["k"], cache["k"], 0, axis=2),
                v=jax.lax.dynamic_update_slice_in_dim(
                    kv_cache["v"], cache["v"], 0, axis=2),
            )
        else:
            kv_cache = cache
        return jnp.transpose(toks), token, pos, kv_cache, done, rng

    def step(carry, _):
        token, pos, cache, done, rng = carry
        if fused:
            # decode megakernel (ops/pallas/fused_decode.py): the whole
            # layer stack in ONE pallas_call — per-step launch count goes
            # from ~10/layer to 3 (megakernel, lm_head, sampling glue).
            # This per-step variant serves non-greedy sampling; the greedy
            # path takes the chunk kernel above. Big models whose
            # attention weights exceed the small kernel's VMEM plan take
            # the fully-tiled big-model variant (fused_decode_big.py, r5).
            from ..models.decoder import build_rope
            from ..ops.linear import linear
            from ..ops.pallas.fused_decode import fused_decode_step
            from ..ops.pallas.fused_decode_big import fused_decode_step_big

            L, B1, A, KH, hd = cache["k"].shape
            assert B1 == 1, "fused decode step is a B=1 latency path"
            x0 = params["tok_emb"][token]  # [1, d]
            kc = cache["k"].reshape(L, A, KH * hd)
            vc = cache["v"].reshape(L, A, KH * hd)
            sin, cos = build_rope(cfg)
            step_fn = fused_decode_step if _small else fused_decode_step_big
            x_fin, kc, vc = step_fn(
                cfg, params, x0, kc, vc, pos[0], sin, cos)
            logits = linear(x_fin, params["lm_head"]).astype(jnp.float32)
            new_cache = dict(k=kc.reshape(L, 1, A, KH, hd),
                             v=vc.reshape(L, 1, A, KH, hd))
        else:
            logits, new_cache = decoder.decode_step(
                cfg, params, token, pos, cache, forward_fn=forward_fn)
        rng, sub = jax.random.split(rng)
        nxt = sample_token(logits, sub, temperature, top_k, top_p)
        nxt = jnp.where(done, token, nxt)
        # freeze the cache for finished rows by keeping pos fixed: a frozen
        # row keeps overwriting the same slot, and its emitted token no
        # longer changes, so the cache content is stable.
        new_done = done | jnp.any(nxt[:, None] == stop_ids[None, :], axis=-1)
        new_pos = jnp.where(done, pos, pos + 1)
        return (nxt, new_pos, new_cache, new_done, rng), nxt

    (token, pos, cache, done, rng), toks = jax.lax.scan(
        step, (token, pos, cache, done, rng), length=steps
    )
    if sliced:
        kv_cache = dict(
            k=jax.lax.dynamic_update_slice_in_dim(
                kv_cache["k"], cache["k"], 0, axis=2),
            v=jax.lax.dynamic_update_slice_in_dim(
                kv_cache["v"], cache["v"], 0, axis=2),
        )
    else:
        kv_cache = cache
    return jnp.transpose(toks), token, pos, kv_cache, done, rng


@dataclass
class GenerateResult:
    text: str
    tokens: List[int]
    prompt_tokens: int
    prefill_s: float
    decode_s: float

    @property
    def tokens_per_s(self) -> float:
        n = len(self.tokens)
        return n / self.decode_s if self.decode_s > 0 else float("inf")


class Generator:
    """Single- and batched-request generation over a dense KV cache."""

    def __init__(self, cfg: ModelConfig, params, tokenizer=None,
                 cache_len: Optional[int] = None, cache_dtype=jnp.float32,
                 chunk: int = 64, forward_fn=None,
                 fused_step: Optional[bool] = None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.cache_len = cache_len or cfg.seq_len
        self.cache_dtype = cache_dtype
        self.chunk = chunk
        self.forward_fn = forward_fn  # e.g. parallel.sharded.ShardedForward
        # decode megakernel (B=1 latency path): None = auto (TPU + Pallas +
        # fused weights + fits VMEM); True forces (tests use the
        # interpreter); False disables. KT_FUSED_STEP=0/1 overrides auto.
        self.fused_step = fused_step

    def _fused_ok(self, B: int) -> bool:
        if B != 1 or self.forward_fn is not None:
            return False
        if self.fused_step is False:
            return False
        from ..ops.pallas.fused_decode import fits_vmem
        from ..ops.pallas.fused_decode_big import fits_vmem_big

        def _anyplan(blocks):
            # the chunked decode loop slices the cache to a bucketed
            # active_len, so plan feasibility is judged per-chunk inside
            # decode_chunk; here the smallest bucket decides eligibility
            import os as _os

            alen = min(_bucket_len(1), self.cache_len)
            big_on = _os.environ.get("KT_FUSED_BIG", "0") == "1"
            return (fits_vmem(blocks, self.cache_dtype, alen)
                    or (big_on and fits_vmem_big(blocks, self.cache_dtype,
                                                 alen)))

        structural = ("blocks" in self.params
                      and "wqkv" in self.params["blocks"]
                      and _anyplan(self.params["blocks"]))
        if self.fused_step is True:
            return structural
        import os

        env = os.environ.get("KT_FUSED_STEP")
        if env is not None:
            return structural and env == "1"
        import sys

        # NOTE: `from ..ops import linear` resolves to the FUNCTION the
        # ops package re-exports, not the module — go via sys.modules
        linear_mod = sys.modules["kuiperllama_tpu.ops.linear"]
        return (structural and linear_mod._USE_PALLAS
                and jax.default_backend() == "tpu")

    def generate_batch_ids(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        stop_ids=frozenset(),
        on_chunk=None,
    ):
        """Batched generation. Returns (list of id-lists, prefill_s, decode_s).

        on_chunk: optional callback invoked with the raw [B, n] numpy token
        block as each decode chunk lands on host (streaming UIs; tokens
        after a row's stop token repeat and must be truncated by the
        consumer — the returned lists are already truncated)."""
        cfg = self.cfg
        B = len(prompts)
        lens = [len(p) for p in prompts]
        assert min(lens) >= 1
        limit = min(self.cache_len, cfg.seq_len)
        assert max(lens) < limit, (max(lens), limit)

        T = min(_bucket(max(lens)), limit)
        tokens = np.zeros((B, T), np.int32)
        for i, p in enumerate(prompts):
            tokens[i, : lens[i]] = p

        cache = decoder.init_kv_cache(cfg, batch=B, max_len=self.cache_len,
                                      dtype=self.cache_dtype)
        if self.forward_fn is not None and hasattr(self.forward_fn, "shard_cache"):
            cache = self.forward_fn.shard_cache(cache)
        stop_arr = _stop_array(stop_ids)
        rng = jax.random.PRNGKey(seed)

        t0 = time.perf_counter()
        last_logits, cache = decoder.prefill(
            cfg, self.params, jnp.asarray(tokens), cache,
            prompt_lens=jnp.asarray(lens, jnp.int32),
            forward_fn=self.forward_fn,
        )
        rng, sub = jax.random.split(rng)
        token = sample_token(last_logits, sub, temperature, top_k, top_p)
        done = jnp.any(token[:, None] == stop_arr[None, :], axis=-1)
        first = np.asarray(token)  # host copy; also syncs prefill
        t1 = time.perf_counter()
        if on_chunk is not None:
            on_chunk(first[:, None])

        pos = jnp.asarray(lens, jnp.int32)
        budget = min(max_new_tokens, limit - max(lens)) - 1
        out = [[int(first[i])] for i in range(B)]
        emitted = 1
        max_pos = max(lens)
        fused = self._fused_ok(B)
        while budget > 0 and not bool(np.asarray(done).all()):
            steps = min(self.chunk, budget)
            active = min(_bucket_len(max_pos + steps + 1), self.cache_len)
            toks, token, pos, cache, done, rng = decode_chunk(
                cfg, self.params, token, pos, cache, done, rng, stop_arr,
                steps=steps, temperature=temperature, top_k=top_k, top_p=top_p,
                forward_fn=self.forward_fn, active_len=active, fused=fused,
            )
            max_pos += steps
            toks_np = np.asarray(toks)
            if on_chunk is not None:
                on_chunk(toks_np)
            for i in range(B):
                out[i].extend(int(t) for t in toks_np[i])
            budget -= steps
            emitted += steps
        decode_s = time.perf_counter() - t1

        # truncate at (and drop) the first stop token per row
        stops = set(int(i) for i in stop_ids)
        cleaned = []
        for row in out:
            cut = len(row)
            for j, t in enumerate(row):
                if t in stops:
                    cut = j
                    break
            cleaned.append(row[:cut])
        return cleaned, t1 - t0, decode_s

    def generate_ids(self, prompt_ids: Sequence[int], max_new_tokens: int = 128,
                     **kw):
        rows, prefill_s, decode_s = self.generate_batch_ids(
            [prompt_ids], max_new_tokens, **kw
        )
        return rows[0], prefill_s, decode_s

    def generate(self, prompt: str, max_new_tokens: int = 128, **kw) -> GenerateResult:
        assert self.tokenizer is not None, "no tokenizer configured"
        tok = self.tokenizer
        prompt_ids = tok.encode(prompt)
        stop = kw.pop("stop_ids", tok.stop_ids)
        ids, prefill_s, decode_s = self.generate_ids(
            prompt_ids, max_new_tokens, stop_ids=stop, **kw
        )
        return GenerateResult(
            text=tok.decode(ids),
            tokens=ids,
            prompt_tokens=len(prompt_ids),
            prefill_s=prefill_s,
            decode_s=decode_s,
        )

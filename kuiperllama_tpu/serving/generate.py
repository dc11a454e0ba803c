"""Single-request generation loop (reference demo/main.cpp `generate`).

Differences from the reference, by design:
  * prefill is ONE batched forward over the whole prompt (the reference
    re-runs its single-token path per prompt token, demo/main.cpp:18-41);
  * sampling happens on device inside the jitted step — the only per-token
    host sync is the int32 token fetch for stop-check/detokenization;
  * prompt lengths are bucketed to powers of two so jit recompiles are
    bounded (static shapes for XLA).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import decoder
from ..ops.sampling import sample_token


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


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


@partial(jax.jit, static_argnames=("cfg", "temperature", "top_k", "top_p"))
def _decode_sample_step(cfg, params, token, pos, kv_cache, rng_key,
                        temperature=0.0, top_k=0, top_p=1.0):
    logits, kv_cache = decoder.decode_step(cfg, params, token, pos, kv_cache)
    nxt = sample_token(logits, rng_key, temperature, top_k, top_p)
    return nxt, kv_cache


class Generator:
    """Holds jitted step functions for one (config, params) pair."""

    def __init__(self, cfg: ModelConfig, params, tokenizer=None,
                 cache_len: Optional[int] = None, cache_dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.cache_len = cache_len or cfg.seq_len
        self.cache_dtype = cache_dtype

    def generate_ids(
        self,
        prompt_ids: List[int],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        stop_ids=frozenset(),
    ):
        """Returns (generated ids, prefill seconds, decode seconds)."""
        cfg = self.cfg
        n_prompt = len(prompt_ids)
        assert n_prompt >= 1
        limit = min(self.cache_len, cfg.seq_len)
        assert n_prompt < limit, (n_prompt, limit)

        T = min(_bucket(n_prompt), limit)
        tokens = np.zeros((1, T), np.int32)
        tokens[0, :n_prompt] = prompt_ids

        cache = decoder.init_kv_cache(cfg, batch=1, max_len=self.cache_len,
                                      dtype=self.cache_dtype)
        t0 = time.perf_counter()
        last_logits, cache = decoder.prefill(
            cfg, self.params, jnp.asarray(tokens), cache,
            prompt_lens=jnp.asarray([n_prompt], jnp.int32),
        )
        rng = jax.random.PRNGKey(seed)
        rng, sub = jax.random.split(rng)
        token = sample_token(last_logits, sub, temperature, top_k, top_p)
        token.block_until_ready()
        t1 = time.perf_counter()

        out_ids: List[int] = []
        decode_s = 0.0
        pos = n_prompt
        t_dec0 = time.perf_counter()
        while pos < min(n_prompt + max_new_tokens, limit):
            tid = int(token[0])
            if tid in stop_ids:
                break
            out_ids.append(tid)
            rng, sub = jax.random.split(rng)
            token, cache = _decode_sample_step(
                cfg, self.params, token, jnp.full((1,), pos, jnp.int32), cache,
                sub, temperature=temperature, top_k=top_k, top_p=top_p,
            )
            pos += 1
        jax.block_until_ready(token)
        decode_s = time.perf_counter() - t_dec0
        return out_ids, t1 - t0, decode_s

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

"""Perplexity evaluation.

The reference checks INT8 quality only by eyeballing CLI output against an
HF script (readme.md:100-101) and printing the max group error at export
(export.py:339-341). Here quantization damage is gated quantitatively:
perplexity over a token stream, with DELTA-ppl(int8, fp32) <= 0.1 as the
acceptance bar (BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .models import decoder


def window_nll(cfg: ModelConfig, params, tokens):
    """Summed negative log-likelihood of tokens[1:] given tokens[:-1].

    tokens: [B, T] int32. Returns (total_nll fp64-ish fp32 scalar, count).
    """
    B, T = tokens.shape
    cache = decoder.init_kv_cache(cfg, batch=B, max_len=T, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = decoder.forward(cfg, params, tokens, positions, cache)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), (T - 1) * B


def perplexity(cfg: ModelConfig, params, token_stream, window: int = 256,
               batch: int = 1) -> float:
    """Perplexity of a 1-D token stream, evaluated in windows.

    Windows are independent (no cross-window context), matching the usual
    sliding-free strided evaluation.
    """
    toks = np.asarray(token_stream, np.int32)
    n_win = len(toks) // window
    assert n_win >= 1, "token stream shorter than one window"
    toks = toks[: n_win * window].reshape(n_win, window)
    total, count = 0.0, 0
    for i in range(0, n_win, batch):
        chunk = toks[i : i + batch]
        nll, c = window_nll(cfg, params, jnp.asarray(chunk))
        total += float(nll)
        count += c
    return float(np.exp(total / count))


def quantization_ppl_delta(cfg_fp, params_fp, cfg_q, params_q, token_stream,
                           window: int = 256) -> dict:
    """ppl(fp) vs ppl(int8) on the same stream. Returns a small report."""
    ppl_fp = perplexity(cfg_fp, params_fp, token_stream, window)
    ppl_q = perplexity(cfg_q, params_q, token_stream, window)
    return {
        "ppl_fp": ppl_fp,
        "ppl_int8": ppl_q,
        "delta": ppl_q - ppl_fp,
        "passes_gate": abs(ppl_q - ppl_fp) <= 0.1,
    }

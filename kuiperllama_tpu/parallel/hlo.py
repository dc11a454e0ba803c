"""Collective accounting from compiled HLO.

The scaling story (tools/scaling.py, SURVEY §2.9) claims an exact per-step
communication bill: 2 psums per layer (after row-parallel wo and w2) plus one
logits all-gather. r2 asserted this analytically; this module VERIFIES it
against what XLA actually emits — `collective_bill` parses a compiled
module's text for collective ops and their payload bytes, so the harness can
assert analytic == emitted (the decoder's layer scan compiles its body once,
so the static in-program count is per-layer-body; multiply by n_layers for
the dynamic bill).
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute")

# `%x = f32[2,1,128]{...} all-reduce(...)` or a tuple result for combined
# collectives; async pairs emit `-start` (counted) and `-done` (skipped).
_OP_RE = re.compile(
    r"=\s*((?:\([^)]*\))|(?:[a-z0-9]+\[[0-9,]*\]\S*))\s+"
    r"(" + "|".join(_COLLECTIVES) + r")(-start)?\(")
_SHAPE_RE = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")


def _shape_bytes(type_str: str) -> int:
    total = 0
    for m in _SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bill(hlo_text: str) -> dict:
    """Count collective ops and their result-payload bytes in HLO text.

    Returns {op_name: {"count": n, "bytes": payload}} for every collective
    kind present (async `-start` forms count once; `-done` is ignored).
    """
    bill: dict = {}
    for m in _OP_RE.finditer(hlo_text):
        rtype, op = m.group(1), m.group(2)
        e = bill.setdefault(op, {"count": 0, "bytes": 0})
        e["count"] += 1
        e["bytes"] += _shape_bytes(rtype)
    return bill


def decode_step_bill(cfg, mesh, params, batch: int = 2, cache_len: int = 32,
                     dtype=None) -> dict:
    """Compile one sharded decode step and return its emitted collective
    bill alongside the analytic expectation.

    The analytic bill per decode step (Megatron TP over the `model` axis):
    per layer-scan body, 2 fp32 all-reduces of [B, 1, dim] (wo + w2) and,
    once, an all-gather producing [B, 1, vocab] fp32 logits. XLA may
    combine the two all-reduces (combiner pass) — the BYTES must match even
    when the counts merge.
    """
    import jax
    import jax.numpy as jnp

    from ..models import decoder
    from .sharded import ShardedForward
    from .shardings import shard_params

    dtype = dtype or jnp.float32
    fwd = ShardedForward(cfg, mesh, params)
    sp = shard_params(params, mesh, cfg)
    cache = fwd.init_cache(batch=batch, max_len=cache_len, dtype=dtype)
    tok = jnp.zeros((batch,), jnp.int32)
    pos = jnp.full((batch,), 3, jnp.int32)

    def step(sp, tok, pos, cache):
        return decoder.decode_step(cfg, sp, tok, pos, cache, forward_fn=fwd)

    compiled = jax.jit(step).lower(sp, tok, pos, cache).compile()
    emitted = collective_bill(compiled.as_text())

    analytic = {
        "all_reduce_bytes_per_body": 2 * batch * cfg.dim * 4,
        "all_reduce_bytes_per_step": 2 * cfg.n_layers * batch * cfg.dim * 4,
        "all_gather_bytes": batch * cfg.vocab_size * 4,
        "bodies_per_step": cfg.n_layers,
    }
    return {"emitted": emitted, "analytic": analytic}

"""Tensor/data-parallel execution via shard_map.

The decoder body (models/decoder.py forward_inner) is written to run on a
local shard: head counts derive from local weight shapes and `tp_axis`
inserts the two Megatron psums per layer (after wo and after w2) plus the
vocab all-gather for sampling. This module wraps it in shard_map over a
("data", "model") mesh so the Pallas kernels run on local shards — GSPMD
cannot partition a pallas_call, manual SPMD can.

Collective pattern per layer (decode): column-parallel qkv/w1/w3 need no
communication; row-parallel wo/w2 end in psum(all-reduce over ICI). XLA's
latency-hiding scheduler overlaps the psum with the next layer's weight
streaming.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models import decoder
from .mesh import DATA_AXIS, MODEL_AXIS
from .shardings import cache_pspec, param_pspec_tree, token_pspec, validate_tp


class ShardedForward:
    """Callable with decoder.forward's signature, running under shard_map.

    Built once per (cfg, mesh, params-structure); reuse across calls.
    """

    # decoder.prefill capability flag: this callable does not take last_pos
    # (full [B, T, vocab] logits come back; prefill slices after)
    supports_last_pos = False

    def __init__(self, cfg: ModelConfig, mesh: Mesh, params_example):
        validate_tp(cfg, mesh.shape[MODEL_AXIS])
        self.cfg = cfg
        self.mesh = mesh
        self._param_specs = param_pspec_tree(params_example)
        self._fn = self._build()

    def _build(self):
        cfg, mesh, pspecs = self.cfg, self.mesh, self._param_specs
        cspec = cache_pspec()
        tspec = token_pspec()

        def body(params, tokens, positions, k, v, kv_len_mask):
            logits, cache = decoder.forward_inner(
                cfg, params, tokens, positions, dict(k=k, v=v),
                kv_len_mask=kv_len_mask, tp_axis=MODEL_AXIS,
            )
            return logits, cache["k"], cache["v"]

        smapped = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(pspecs, tspec, tspec, cspec, cspec, tspec),
            out_specs=(P(DATA_AXIS, None, None), cspec, cspec),
            check_vma=False,
        )

        @jax.jit
        def fwd(params, tokens, positions, kv_cache, kv_len_mask):
            logits, k, v = smapped(
                params, tokens, positions, kv_cache["k"], kv_cache["v"],
                kv_len_mask,
            )
            return logits, dict(k=k, v=v)

        return fwd

    def __call__(self, cfg, params, tokens, positions, kv_cache,
                 kv_len_mask=None):
        assert cfg is self.cfg or cfg == self.cfg
        B, T = tokens.shape
        if kv_len_mask is None:
            # shard_map needs a concrete operand; an all-true mask is
            # equivalent to "causal only" (slots beyond pos are masked anyway)
            S = kv_cache["k"].shape[2]
            kv_len_mask = jnp.ones((B, S), bool)
        return self._fn(params, tokens, positions, kv_cache, kv_len_mask)

    # -- placement helpers

    def shard_cache(self, kv_cache):
        sh = NamedSharding(self.mesh, cache_pspec())
        return jax.tree.map(lambda x: jax.device_put(x, sh), kv_cache)

    def init_cache(self, batch: int, max_len: Optional[int] = None,
                   dtype=jnp.float32):
        cache = decoder.init_kv_cache(self.cfg, batch, max_len, dtype)
        return self.shard_cache(cache)

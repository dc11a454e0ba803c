"""Tensor-parallel paged serving via shard_map.

BASELINE configs[3]-[4] ("Llama-2-7B INT8 tensor-sharded across 1 host,
paged KV cache + continuous batching"): the paged decode/prefill steps run
as manual-SPMD shard_map bodies so the Pallas kernels (fused dequant matmul,
flash-decode paged attention) execute on local shards — GSPMD cannot
partition a pallas_call, manual SPMD can.

Sharding layout:
  * weights: Megatron TP (parallel/shardings.py) — wq/wk/wv/w1/w3/lm_head
    column-sharded, wo/w2 row-sharded (psum inside the layer body);
  * page pools [L, P, ps, KH*hd]: sharded over the LANE dim, which is
    kv-head-major — each shard owns a contiguous block of kv heads of every
    page, so the host's page tables / flat work lists stay global and
    replicate unchanged;
  * scheduler state (tokens, positions, page tables, work lists): replicated
    — the host owns one copy, every shard sees the same admission decisions;
  * logits: vocab-sharded, all-gathered before sampling; the rng key is
    replicated so every shard samples the identical token (no divergence).

Collectives per decode step: 2 psums per layer (wo, w2) + 1 logits
all-gather, all riding ICI; XLA's latency-hiding scheduler overlaps them
with the next layer's weight streaming.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models.paged import (decode_chunk_paged_inner,
                            prefill_chunk_paged_inner, prefill_paged_inner)
from .mesh import MODEL_AXIS
from .shardings import param_pspec_tree, validate_tp

PAGE_SPEC = P(None, None, None, MODEL_AXIS)  # [L, P, ps, KH*hd] over kv heads
_REP = P()


class ShardedPagedStep:
    """Sharded drop-in for models/paged.py's jitted entry points.

    Built once per (cfg, mesh, params-structure). `decode_chunk` and
    `prefill` have the same signatures as decode_chunk_paged/prefill_paged.
    """

    def __init__(self, cfg: ModelConfig, mesh: Mesh, params_example):
        validate_tp(cfg, mesh.shape[MODEL_AXIS])
        self.cfg = cfg
        self.mesh = mesh
        self._pspecs = param_pspec_tree(params_example)
        self._decode = self._build_decode()
        self._prefill = self._build_prefill()
        self._prefill_chunk = self._build_prefill_chunk()

    # -- builders

    def _build_decode(self):
        cfg, mesh, pspecs = self.cfg, self.mesh, self._pspecs

        @partial(jax.jit,
                 static_argnames=("steps", "page_size", "temperature",
                                  "top_k", "top_p"),
                 donate_argnames=("k_pages", "v_pages"))
        def fwd(params, token, pos, k_pages, v_pages, done, rng, stop_ids,
                page_table_dev, flat_b, flat_page, flat_tok0, n_items,
                steps, page_size=128, temperature=0.0, top_k=0, top_p=1.0):
            def body(params, token, pos, kp, vp, done, rng, stop_ids,
                     pt, fb, fp, ft, ni):
                return decode_chunk_paged_inner(
                    cfg, params, token, pos, kp, vp, done, rng, stop_ids,
                    pt, fb, fp, ft, ni, steps=steps, page_size=page_size,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    tp_axis=MODEL_AXIS,
                )

            sm = jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, _REP, _REP, PAGE_SPEC, PAGE_SPEC, _REP,
                          _REP, _REP, _REP, _REP, _REP, _REP, _REP),
                out_specs=(_REP, _REP, _REP, PAGE_SPEC, PAGE_SPEC, _REP, _REP),
                check_vma=False,
            )
            return sm(params, token, pos, k_pages, v_pages, done, rng,
                      stop_ids, page_table_dev, flat_b, flat_page, flat_tok0,
                      n_items)

        return fwd

    def _build_prefill(self):
        cfg, mesh, pspecs = self.cfg, self.mesh, self._pspecs

        @partial(jax.jit, donate_argnames=("k_pages", "v_pages"))
        def fwd(params, tokens, prompt_lens, k_pages, v_pages,
                token_pages, token_offs):
            def body(params, tokens, prompt_lens, kp, vp, tpg, tof):
                return prefill_paged_inner(
                    cfg, params, tokens, prompt_lens, kp, vp, tpg, tof,
                    tp_axis=MODEL_AXIS,
                )

            sm = jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, _REP, _REP, PAGE_SPEC, PAGE_SPEC, _REP, _REP),
                out_specs=(_REP, PAGE_SPEC, PAGE_SPEC),
                check_vma=False,
            )
            return sm(params, tokens, prompt_lens, k_pages, v_pages,
                      token_pages, token_offs)

        return fwd

    def _build_prefill_chunk(self):
        cfg, mesh, pspecs = self.cfg, self.mesh, self._pspecs

        @partial(jax.jit, donate_argnames=("k_pages", "v_pages"))
        def fwd(params, tokens_chunk, chunk_start, row_lens, k_pages,
                v_pages, chunk_pages, hist_pages):
            def body(params, tc, cs, rl, kp, vp, cp, hp):
                return prefill_chunk_paged_inner(
                    cfg, params, tc, cs, rl, kp, vp, cp, hp,
                    tp_axis=MODEL_AXIS,
                )

            sm = jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, _REP, _REP, _REP, PAGE_SPEC, PAGE_SPEC,
                          _REP, _REP),
                out_specs=(_REP, _REP, PAGE_SPEC, PAGE_SPEC),
                check_vma=False,
            )
            return sm(params, tokens_chunk, chunk_start, row_lens, k_pages,
                      v_pages, chunk_pages, hist_pages)

        return fwd

    # -- call surfaces matching models/paged.py

    def decode_chunk(self, cfg, params, token, pos, k_pages, v_pages, done,
                     rng, stop_ids, page_table_dev, flat_b, flat_page,
                     flat_tok0, n_items, steps, page_size=128,
                     temperature=0.0, top_k=0, top_p=1.0):
        assert cfg == self.cfg
        return self._decode(params, token, pos, k_pages, v_pages, done, rng,
                            stop_ids, page_table_dev, flat_b, flat_page,
                            flat_tok0, n_items, steps=steps,
                            page_size=page_size, temperature=temperature,
                            top_k=top_k, top_p=top_p)

    def prefill(self, cfg, params, tokens, prompt_lens, k_pages, v_pages,
                token_pages, token_offs):
        assert cfg == self.cfg
        return self._prefill(params, tokens, prompt_lens, k_pages, v_pages,
                             token_pages, token_offs)

    def prefill_chunk(self, cfg, params, tokens_chunk, chunk_start, row_lens,
                      k_pages, v_pages, chunk_pages, hist_pages):
        assert cfg == self.cfg
        return self._prefill_chunk(params, tokens_chunk, chunk_start,
                                   row_lens, k_pages, v_pages, chunk_pages,
                                   hist_pages)

    # -- placement

    def shard_pages(self, k_pages, v_pages):
        sh = NamedSharding(self.mesh, PAGE_SPEC)
        return jax.device_put(k_pages, sh), jax.device_put(v_pages, sh)

"""PartitionSpecs for weights, KV cache and activations.

Megatron-style tensor parallelism over the "model" mesh axis (SURVEY.md §7
step 7; scaling-book recipe — annotate shardings, let XLA/shard_map insert
the collectives):

  column-parallel (shard out dim): wq wk wv w1 w3, qkv biases, lm_head
  row-parallel    (shard in dim):  wo w2           (psum after)
  replicated:                      norms, tok_emb
  KV cache:                        sharded over kv heads
  activations/tokens:              batch over "data"

Weight arrays are [L, in, out]; quantized weights are QuantArray(q [L,in,out],
s [L, in/g, out]) and shard identically (the scale group axis follows `in`).
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from .mesh import DATA_AXIS, MODEL_AXIS

# name -> (spec for stacked [L, ...] weight leaf)
_COL = P(None, None, MODEL_AXIS)   # shard out
_ROW = P(None, MODEL_AXIS, None)   # shard in

_RULES = [
    ("tok_emb", P(None, None)),
    ("final_norm", P(None)),
    ("lm_head", P(None, MODEL_AXIS)),
    ("attn_norm", P(None, None)),
    ("ffn_norm", P(None, None)),
    # fused (per-shard, fuse.fuse_params_sharded) before their prefixes
    ("wqkv", _COL), ("w13", _COL), ("bqkv", P(None, MODEL_AXIS)),
    ("wq", _COL), ("wk", _COL), ("wv", _COL), ("w1", _COL), ("w3", _COL),
    ("wo", _ROW), ("w2", _ROW),
    ("bq", P(None, MODEL_AXIS)), ("bk", P(None, MODEL_AXIS)),
    ("bv", P(None, MODEL_AXIS)),
]


# Sequence-parallel (page-dim sharded KV pool) weight layout: every shard
# computes the FULL q/k/v for a token (it must write complete lanes into
# the pages it owns, and the flash merge needs all heads' stats), so the
# ATTENTION weights replicate while the MLP stays Megatron-sharded. The
# redundant attention compute is the price for sharding the KV PAGE READS
# — the long-context decode bottleneck — by 1/sp, and for lifting the
# (KH/tp)*hd 128-lane ceiling: hd=64 families (Qwen2.5-0.5B: tp=1 under
# lane sharding) shard over pages with FULL 128-aligned lanes, and n_heads
# need not divide the shard count at all.
_RULES_SEQPAR = [
    ("tok_emb", P(None, None)),
    ("final_norm", P(None)),
    ("lm_head", P(None, MODEL_AXIS)),
    ("attn_norm", P(None, None)),
    ("ffn_norm", P(None, None)),
    ("wqkv", P(None, None, None)), ("bqkv", P(None, None)),
    ("w13", _COL),
    ("wq", P(None, None, None)), ("wk", P(None, None, None)),
    ("wv", P(None, None, None)), ("wo", P(None, None, None)),
    ("w1", _COL), ("w3", _COL), ("w2", _ROW),
    ("bq", P(None, None)), ("bk", P(None, None)), ("bv", P(None, None)),
]


def _spec_for(path, leaf, rules=_RULES) -> P:
    pathstr = jax.tree_util.keystr(path)
    for name, spec in rules:
        if name in pathstr:
            return spec
    raise ValueError(f"no sharding rule for param at {pathstr}")


def param_pspec_tree(params):
    """A pytree with the SAME structure as `params` whose leaves are
    PartitionSpecs (quant q/s leaves share their weight's spec — identical
    rank, groups along `in`). Suitable for shard_map in_specs and device_put."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def param_pspec_tree_seqpar(params):
    """PartitionSpec tree for the sequence-parallel mode: attention weights
    replicated, MLP Megatron-sharded, lm_head vocab-sharded."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _spec_for(p, x, _RULES_SEQPAR), params)


def cache_pspec() -> P:
    """KV cache [L, B, S, KH, hd]: batch over data, kv heads over model."""
    return P(None, DATA_AXIS, None, MODEL_AXIS, None)


def token_pspec() -> P:
    return P(DATA_AXIS, None)


def validate_tp(cfg: ModelConfig, tp: int):
    assert cfg.n_kv_heads % tp == 0, (
        f"tensor-parallel degree {tp} must divide n_kv_heads={cfg.n_kv_heads}"
    )
    assert cfg.n_heads % tp == 0 and cfg.hidden_dim % tp == 0
    assert cfg.vocab_size % tp == 0, (cfg.vocab_size, tp)
    # The paged pool's lane dim is KV-head-major (kvcache.py): sharding over
    # kv heads leaves each shard a (KH/tp)*hd lane block, and compiled Mosaic
    # DMAs need the minor dim 128-aligned. hd=64 families (TinyLlama-1.1B,
    # Qwen2.5-0.5B) therefore support tp only up to KH*hd/128, NOT up to KH.
    # Fail at setup: the interpreter (CPU CI) would happily run geometries
    # that can never compile on TPU, surfacing the error at first decode in
    # production instead.
    local_lane = (cfg.n_kv_heads // tp) * cfg.head_dim
    if local_lane % 128 != 0:
        msg = (
            f"tp={tp} leaves a per-shard KV lane dim of {local_lane} "
            f"(= n_kv_heads/tp * head_dim = {cfg.n_kv_heads}/{tp} * "
            f"{cfg.head_dim}); compiled Mosaic DMAs need a 128-aligned "
            f"minor dim, so this tp degree cannot run on TPU hardware "
            f"(max tp for this model: "
            f"{max(1, cfg.n_kv_heads * cfg.head_dim // 128)})"
        )
        if jax.default_backend() == "tpu":
            raise ValueError(msg)
        import warnings

        warnings.warn(msg + " — continuing only because this backend runs "
                      "the Pallas interpreter", stacklevel=2)


def validate_seqpar(cfg: ModelConfig, sp: int):
    """Setup-time checks for sequence-parallel page sharding. The pool
    keeps FULL lanes per shard, so the only lane rule is the UNSHARDED one
    (KH*hd % 128 — true for every supported family); n_heads need not
    divide sp (attention is replicated), only the MLP/vocab dims must."""
    assert cfg.hidden_dim % sp == 0, (cfg.hidden_dim, sp)
    assert cfg.vocab_size % sp == 0, (cfg.vocab_size, sp)
    # Mirror validate_tp's lane rule for the Megatron-sharded MLP columns
    # and the vocab-sharded lm_head: a per-shard column dim that is not
    # 128-lane aligned passes on the CPU interpreter but fails Mosaic
    # compilation on real hardware. Warn/raise at setup, not first decode.
    for name, local in (("hidden_dim", cfg.hidden_dim // sp),
                        ("vocab_size", cfg.vocab_size // sp)):
        if local % 128 != 0:
            msg = (
                f"seqpar sp={sp} leaves a per-shard {name} column dim of "
                f"{local}; compiled Mosaic kernels need 128-lane-aligned "
                f"column blocks, so this sp degree cannot run on TPU "
                f"hardware"
            )
            if jax.default_backend() == "tpu":
                raise ValueError(msg)
            import warnings

            warnings.warn(msg + " — continuing only because this backend "
                          "runs the Pallas interpreter", stacklevel=2)


def shard_params(params, mesh, cfg: ModelConfig, seqpar: bool = False):
    """device_put a params pytree (numpy or device arrays) with TP shardings.

    Takes UNFUSED params: a host-fused wqkv concatenates GLOBAL q|k|v
    columns, and column-sharding that hands each shard a mix of q/k/v
    columns from the wrong shards. To combine fusion with TP, shard first
    and then fuse per shard with fuse.fuse_params_sharded.

    seqpar=True uses the sequence-parallel layout (attention replicated,
    MLP sharded — see param_pspec_tree_seqpar)."""
    assert "wqkv" not in params["blocks"], (
        "shard unfused params, then fuse.fuse_params_sharded(sharded, mesh)"
    )
    if seqpar:
        validate_seqpar(cfg, mesh.shape[MODEL_AXIS])
        specs = param_pspec_tree_seqpar(params)
    else:
        validate_tp(cfg, mesh.shape[MODEL_AXIS])
        specs = param_pspec_tree(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )

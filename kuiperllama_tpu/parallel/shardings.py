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


def _spec_for(path, leaf) -> P:
    pathstr = jax.tree_util.keystr(path)
    for name, spec in _RULES:
        if name in pathstr:
            return spec
    raise ValueError(f"no sharding rule for param at {pathstr}")


def param_pspec_tree(params):
    """A pytree with the SAME structure as `params` whose leaves are
    PartitionSpecs (quant q/s leaves share their weight's spec — identical
    rank, groups along `in`). Suitable for shard_map in_specs and device_put."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


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


def shard_params(params, mesh, cfg: ModelConfig):
    """device_put a params pytree (numpy or device arrays) with TP shardings.

    Takes UNFUSED params: a host-fused wqkv concatenates GLOBAL q|k|v
    columns, and column-sharding that hands each shard a mix of q/k/v
    columns from the wrong shards. To combine fusion with TP, shard first
    and then fuse per shard with fuse.fuse_params_sharded."""
    assert "wqkv" not in params["blocks"], (
        "shard unfused params, then fuse.fuse_params_sharded(sharded, mesh)"
    )
    validate_tp(cfg, mesh.shape[MODEL_AXIS])
    specs = param_pspec_tree(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )

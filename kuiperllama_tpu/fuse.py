"""Weight fusion transforms.

Decode is launch-overhead-sensitive: TinyLlama runs 7 projection kernels per
layer per token. Concatenating wq|wk|wv (column dim) and w1|w3 turns those
into 2 kernels with identical math — the outputs are sliced back apart.
Works for both dense arrays and QuantArray (groups run along `in`, so
concatenation along `out` keeps every group intact).

The decoder detects fused keys ("wqkv", "w13") in a block and splits the
projection outputs by the per-part sizes recorded in the config shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .quant import QuantArray


def _concat_out(ws):
    """Concat weights along the last (out) axis; handles QuantArray."""
    if isinstance(ws[0], QuantArray):
        g = ws[0].group_size
        assert all(w.group_size == g for w in ws)
        return QuantArray(
            q=jnp.concatenate([w.q for w in ws], axis=-1),
            s=jnp.concatenate([w.s for w in ws], axis=-1),
            group_size=g,
        )
    if isinstance(ws[0], np.ndarray):
        return np.concatenate(ws, axis=-1)
    return jnp.concatenate(ws, axis=-1)


def fuse_params(params):
    """Return a params pytree with fused qkv and gate/up projections.

    Accepts device or numpy trees (quant dict leaves must be converted to
    QuantArray first — i.e. run after params.to_device)."""
    blocks = dict(params["blocks"])
    blocks["wqkv"] = _concat_out([blocks.pop("wq"), blocks.pop("wk"),
                                  blocks.pop("wv")])
    blocks["w13"] = _concat_out([blocks.pop("w1"), blocks.pop("w3")])
    if "bq" in blocks:
        bq, bk, bv = blocks.pop("bq"), blocks.pop("bk"), blocks.pop("bv")
        cat = np.concatenate if isinstance(bq, np.ndarray) else jnp.concatenate
        blocks["bqkv"] = cat([bq, bk, bv], axis=-1)
    out = dict(params)
    out["blocks"] = blocks
    return out


def is_fused(blocks) -> bool:
    return "wqkv" in blocks


def fuse_params_sharded(params, mesh, seqpar: bool = False):
    """qkv/gate-up fusion of an ALREADY tensor-sharded params tree.

    Host-side fusion before sharding is invalid: concatenating global
    q|k|v columns and then column-sharding the result hands each shard a
    contiguous block of GLOBAL columns, mixing q/k/v of different shards.
    Fusing inside shard_map concatenates each shard's LOCAL columns instead
    — the global view becomes [q_0|k_0|v_0 | q_1|k_1|v_1 | ...], which is
    exactly what the shard_map decoder body (local-shape splits) expects.
    Returns a new params tree with wqkv/w13 (and bqkv) leaves sharded on
    the model axis.

    seqpar=True: the sequence-parallel layout replicates attention weights
    (parallel/shardings.param_pspec_tree_seqpar), so wqkv/bqkv fuse with
    replicated specs; w13 stays per-shard column fusion.
    """
    import jax
    from jax.sharding import PartitionSpec as P

    from .parallel.mesh import MODEL_AXIS

    col = P(None, None, MODEL_AXIS)
    vec = P(None, MODEL_AXIS)
    qkv_spec = P(None, None, None) if seqpar else col
    bias_spec = P(None, None) if seqpar else vec

    def cat(n_in, spec):
        fuse = lambda *ws: _concat_out(list(ws))
        return jax.jit(jax.shard_map(
            fuse, mesh=mesh, in_specs=(spec,) * n_in, out_specs=spec,
            check_vma=False,
        ))

    blocks = dict(params["blocks"])
    blocks["wqkv"] = cat(3, qkv_spec)(blocks.pop("wq"), blocks.pop("wk"),
                                      blocks.pop("wv"))
    blocks["w13"] = cat(2, col)(blocks.pop("w1"), blocks.pop("w3"))
    if "bq" in blocks:
        blocks["bqkv"] = cat(3, bias_spec)(blocks.pop("bq"),
                                           blocks.pop("bk"),
                                           blocks.pop("bv"))
    out = dict(params)
    out["blocks"] = blocks
    return out

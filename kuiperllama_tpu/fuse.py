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

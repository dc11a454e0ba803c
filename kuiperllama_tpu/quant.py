"""Group-wise symmetric INT8 weight quantization (Q8_0).

TPU-native reimplementation of the reference's quantization scheme
(/root/reference/tools/export.py:49-73 `quantize_q80`): symmetric per-group
scale = absmax/127, groups of `group_size` consecutive elements along the
*reduction* dimension.

Storage convention differs from the reference on purpose: the reference keeps
weights `[out, in]` and runs a GEMV `W·x`; on TPU we store `[in, out]` so the
hot op is `x @ W` with the contraction on the MXU's natural axis. Groups run
along `in` (axis -2), so a weight `[in, out]` has scales `[in // g, out]`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class QuantArray:
    """int8 values + fp32 group scales. Groups run along axis -2 (the `in` dim).

    q: int8  [..., in, out]
    s: fp32  [..., n_scale_rows, out]  with n_scale_rows >= in // group_size

    The scale rows MAY be padded past in//group_size (device-side arrays
    pad to a multiple of 8 — Mosaic cannot address sub-8-sublane scale
    blocks, and shapes like Llama-2-7B's hidden_dim=11008 have
    in/group = 172 with no multiple-of-8 divisor). Consumers must index
    rows [:in // group_size]; the padding rows are never read.
    """

    q: jax.Array
    s: jax.Array
    group_size: int = field(metadata=dict(static=True), default=64)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.s.dtype


def quantize_q80(w, group_size: int = 64, axis: int = -2):
    """Quantize `w` into (int8, scales) with groups along `axis`.

    Matches the reference's Q8_0: scale = absmax/127 per group, round-to-nearest
    (banker's rounding differences vs torch.round are below the dequant error).
    Returns QuantArray with groups along axis -2 of a [..., in, out] weight.
    """
    w = jnp.asarray(w, jnp.float32)
    axis = axis % w.ndim
    assert w.shape[axis] % group_size == 0, (w.shape, axis, group_size)
    # Move group axis into blocks: [..., n_groups, group_size, ...rest]
    ng = w.shape[axis] // group_size
    new_shape = w.shape[:axis] + (ng, group_size) + w.shape[axis + 1 :]
    wg = w.reshape(new_shape)
    absmax = jnp.max(jnp.abs(wg), axis=axis + 1, keepdims=True)
    scale = absmax / 127.0
    # Avoid div-by-zero on all-zero groups.
    safe = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.clip(jnp.round(wg / safe), -127, 127).astype(jnp.int8)
    q = q.reshape(w.shape)
    s = jnp.squeeze(scale, axis=axis + 1)
    return QuantArray(q=q, s=s.astype(jnp.float32), group_size=group_size)


def cast_scales(tree, dtype=jnp.bfloat16):
    """Cast every QuantArray's scales in a params pytree to `dtype`.

    bf16 scales in fast mode cost nothing (the kernel casts scales to bf16
    before the multiply anyway) and cut the scale stream in half — at
    group=64 that is 1/32 of the weight bytes, ~3% more decode tokens/s.
    Checkpoints keep fp32 scales on disk (the reference contract,
    export.py:152-188); cast at load."""
    def f(x):
        if isinstance(x, QuantArray):
            return QuantArray(q=x.q, s=x.s.astype(dtype),
                              group_size=x.group_size)
        return x

    return jax.tree.map(f, tree,
                        is_leaf=lambda x: isinstance(x, QuantArray))


def pad_scale_rows(s, multiple: int = 8):
    """Pad the scale-row axis (-2) up to a multiple (see QuantArray doc)."""
    rows = s.shape[-2]
    pad = -rows % multiple
    if pad == 0:
        return s
    widths = [(0, 0)] * s.ndim
    widths[-2] = (0, pad)
    return jnp.pad(s, widths) if isinstance(s, jax.Array) else np.pad(s, widths)


def dequantize(qa: QuantArray) -> jax.Array:
    """Reference dequant: float = int8 * group_scale. fp32 output."""
    g = qa.group_size
    q = qa.q
    in_dim = q.shape[-2]
    ng = in_dim // g
    qg = q.reshape(q.shape[:-2] + (ng, g) + q.shape[-1:]).astype(jnp.float32)
    s = qa.s[..., :ng, :][..., :, None, :]  # [..., ng, 1, out]
    return (qg * s).reshape(q.shape)


def quant_error(w, group_size: int = 64) -> float:
    """Max abs group error after a quant/dequant round trip (export.py prints this)."""
    qa = quantize_q80(w, group_size)
    return float(jnp.max(jnp.abs(dequantize(qa) - jnp.asarray(w, jnp.float32))))


# ---- numpy-side helpers used by the checkpoint writer (no device round trip)


def quantize_q80_np(w: np.ndarray, group_size: int = 64):
    """Row-major Q8_0 exactly as the reference exporter lays it out on disk:
    `w` is the reference-orientation [out, in] matrix; groups are consecutive
    elements of the flattened row-major array. Returns (int8 flat, fp32 scales).

    Requires in % group_size == 0 so that groups align to the reduction dim
    (true for every real Llama/Qwen shape; the fused TPU kernel relies on it).
    """
    assert w.ndim == 1 or w.shape[-1] % group_size == 0, (w.shape, group_size)
    flat = np.asarray(w, np.float32).reshape(-1, group_size)
    absmax = np.abs(flat).max(axis=1)
    scale = absmax / 127.0
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.round(flat / safe[:, None]), -127, 127).astype(np.int8)
    err = np.abs(q.astype(np.float32) * safe[:, None] - flat).max() if flat.size else 0.0
    return q.reshape(-1), scale.astype(np.float32), float(err)

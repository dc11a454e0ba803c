"""Linear projection with optional group-wise INT8 weights.

The reference's matmul is a single-row GEMV (decode-style) with an optionally
fused per-group dequant (kuiper/source/op/kernels/cuda/matmul_kernel.cu). On
TPU the projection is `x @ W` on the MXU; the INT8 path uses the Pallas fused
dequant+matmul kernel (ops/pallas/quant_matmul.py) when enabled, else an XLA
expression that scales int8 blocks into the accumulation dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant import QuantArray

# Global switch: flipped off in tests to compare against the XLA path.
_USE_PALLAS = True


def set_use_pallas(flag: bool):
    global _USE_PALLAS
    _USE_PALLAS = flag


# Prefill (large-M) projections dequantize the whole weight to bf16 ONCE
# and take a plain XLA dot: at M >= ~256 the matmul is MXU-compute-bound,
# and the Pallas kernel's per-(m-block, tile) in-kernel dequant re-casts
# the same weight tile for every m block (n_m x the VPU work — measured
# as ~25-30% prefill MFU in r4's longctx TTFT). The one bf16 weight
# transient (45 MB for 7B w13) is negligible next to prefill activations.
# KT_PREFILL_XLA_M=0 disables the route (process-start-only sweep knob).
import os as _os

_XLA_PREFILL_M = int(_os.environ.get("KT_PREFILL_XLA_M", "256"))


def _dequant_dot_xla(x, w: QuantArray, layer_idx=None):
    """Large-M path: materialize dequant(w) in bf16, one full-speed MXU
    dot. With layer_idx, the dynamic layer slice fuses into XLA's
    gather/dot pipeline (no Pallas operand-copy problem here)."""
    q, s = w.q, w.s
    if layer_idx is not None:
        q = jax.lax.dynamic_index_in_dim(q, layer_idx, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(s, layer_idx, 0, keepdims=False)
    g = w.group_size
    in_dim, out_dim = q.shape[-2], q.shape[-1]
    ng = in_dim // g
    wd = (q.astype(jnp.bfloat16).reshape(ng, g, out_dim)
          * s[:ng, None, :].astype(jnp.bfloat16)).reshape(in_dim, out_dim)
    out = jax.lax.dot_general(
        x.astype(jnp.bfloat16), wd,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def _quant_matmul_xla(x, w: QuantArray):
    """x: [..., in] @ int8 [in, out] with fp32 group scales [in/g, out].

    Strategy: contract per group in the activation dtype, scale partial sums in
    fp32. Keeps the int8->MXU path fusable by XLA without materializing the
    dequantized weight at full [in, out] fp32 (only one [g, out] tile at a time
    after XLA scheduling; in practice XLA may still materialize — the Pallas
    kernel is the production path, this is the oracle).
    """
    g = w.group_size
    in_dim, out_dim = w.q.shape[-2], w.q.shape[-1]
    ng = in_dim // g
    lead = x.shape[:-1]
    xg = x.reshape(*lead, ng, g).astype(jnp.float32)
    qg = w.q.reshape(ng, g, out_dim).astype(jnp.float32)
    # partial[..., ng, out] = sum_g xg * qg ; then scale per group and sum.
    # (s rows may carry 8-alignment padding — see QuantArray docstring)
    partial = jnp.einsum("...ng,ngo->...no", xg, qg)
    out = jnp.sum(partial * w.s[:ng].astype(jnp.float32), axis=-2)
    return out.astype(x.dtype)


def linear(x, w, bias=None):
    """x: [..., in]; w: [in, out] array or QuantArray; bias: [out] or None."""
    if isinstance(w, QuantArray):
        rows = 1
        for dim in x.shape[:-1]:
            rows *= dim
        if _XLA_PREFILL_M and rows >= _XLA_PREFILL_M:
            out = _dequant_dot_xla(x, w)
        elif _USE_PALLAS and x.ndim >= 2:
            from .pallas.quant_matmul import quant_matmul

            out = quant_matmul(x, w)
        else:
            out = _quant_matmul_xla(x, w)
    else:
        out = jax.lax.dot_general(
            x, w.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def linear_layered(x, w, layer_idx, bias=None):
    """linear() against layer `layer_idx` of a STACKED weight [L, in, out].

    The point (vs slicing then calling linear): a pallas_call operand
    cannot fuse a dynamic-slice, so slicing the stacked weight inside a
    lax.scan over layers materializes a full copy of every layer's weights
    each step — decode is weight-bandwidth-bound, so that copy alone costs
    ~2x tokens/s. The layered kernel indexes the layer in its BlockSpec
    index_map and DMAs tiles straight from the stacked HBM buffer.
    """
    if isinstance(w, QuantArray):
        rows = 1
        for dim in x.shape[:-1]:
            rows *= dim
        if _XLA_PREFILL_M and rows >= _XLA_PREFILL_M:
            out = _dequant_dot_xla(x, w, layer_idx)
        elif _USE_PALLAS and x.ndim >= 2:
            from .pallas.quant_matmul import quant_matmul_layered

            out = quant_matmul_layered(x, w, layer_idx)
        else:
            wl = QuantArray(
                q=jax.lax.dynamic_index_in_dim(w.q, layer_idx, 0, False),
                s=jax.lax.dynamic_index_in_dim(w.s, layer_idx, 0, False),
                group_size=w.group_size,
            )
            out = _quant_matmul_xla(x, wl)
    else:
        # XLA fuses a dynamic-slice into its own dot emitters
        wl = jax.lax.dynamic_index_in_dim(w, layer_idx, 0, keepdims=False)
        out = jax.lax.dot_general(
            x, wl.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if bias is not None:
        bl = jax.lax.dynamic_index_in_dim(bias, layer_idx, 0, keepdims=False)
        out = out + bl.astype(out.dtype)
    return out

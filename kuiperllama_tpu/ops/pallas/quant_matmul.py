"""Fused group-dequant INT8 matmul Pallas kernel.

TPU-native replacement for the reference's dequant-fused GEMV
(kuiper/source/op/kernels/cuda/matmul_kernel.cu:56-87
`matmul_kernel_cu_fp32int8`): weights stream from HBM as int8 (4x less
bandwidth than fp32 — decode is weight-bandwidth-bound), dequantization
happens on-chip in VMEM against the group scales, and the contraction runs
on the MXU with fp32 accumulation.

Two modes (measured on v5e, 4096x4096, decode M=8):
  fast  — int8 -> bf16 cast, bf16 scale multiply, single bf16 MXU pass.
          ~31us = 580 GB/s effective int8 bandwidth (~70% of HBM roofline;
          1.5x the tokens/s of a bf16 dense weight read). Error ~3e-3
          relative — the same class as bf16 activations themselves.
  exact — fp32 dequant + fp32 HIGHEST matmul (6 MXU passes). Bit-accurate
          against the fp32 XLA oracle; used by parity tests and fp32 runs.

Layout (see quant.py): q int8 [in, out], scales fp32 [in/g, out], groups
along the reduction dim. Grid is (out_tiles, in_tiles) with the reduction
innermost; partials accumulate in a VMEM scratch, the output tile is
written on the last reduction step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant import QuantArray

_DEFAULT_MODE = "fast"


def set_quant_matmul_mode(mode: str):
    """Set the global default ("fast" | "exact")."""
    global _DEFAULT_MODE
    assert mode in ("fast", "exact"), mode
    _DEFAULT_MODE = mode


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, group_size, n_k, mode):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tk, tn = q_ref.shape
    ng = tk // group_size
    if mode == "fast":
        # int8 payloads are exact in bf16; only the scale multiply rounds.
        qb = q_ref[:].astype(jnp.bfloat16).reshape(ng, group_size, tn)
        sb = s_ref[:].astype(jnp.bfloat16)
        w = (qb * sb[:, None, :]).reshape(tk, tn)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        qf = q_ref[:].astype(jnp.float32).reshape(ng, group_size, tn)
        w = (qf * s_ref[:][:, None, :]).reshape(tk, tn)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _interpret() -> bool:
    # Compiled Mosaic kernels need real TPU hardware; CPU tests use the
    # Pallas interpreter (same semantics, slow).
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_out", "block_in", "out_dtype", "mode"),
)
def _quant_matmul_2d(x, q, s, group_size: int, block_out: int = 512,
                     block_in: int = 2048, out_dtype=None, mode: str = "fast"):
    """x [M, K] @ dequant(q [K, N], s [K/g, N]) -> [M, N]."""
    M, K = x.shape
    K2, N = q.shape
    assert K == K2, (x.shape, q.shape)
    g = group_size
    out_dtype = out_dtype or x.dtype

    TN = min(block_out, _round_up(N, 128))
    TK = min(block_in, _round_up(K, g))
    assert TK % g == 0, (TK, g)
    n_n, n_k = _cdiv(N, TN), _cdiv(K, TK)
    TM = _round_up(M, 8)

    # Pad inputs so the grid covers them exactly (zero rows/cols contribute
    # nothing to the contraction).
    if M != TM:
        x = jnp.pad(x, ((0, TM - M), (0, 0)))
    if K % TK or N % TN:
        x = jnp.pad(x, ((0, 0), (0, n_k * TK - K)))
        q = jnp.pad(q, ((0, n_k * TK - K), (0, n_n * TN - N)))
        s = jnp.pad(s, ((0, (n_k * TK - K) // g), (0, n_n * TN - N)))

    kernel = functools.partial(_kernel, group_size=g, n_k=n_k, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((TM, TK), lambda j, k: (0, k)),
            pl.BlockSpec((TK, TN), lambda j, k: (k, j)),
            pl.BlockSpec((TK // g, TN), lambda j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((TM, n_n * TN), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * TM * K * N,
            bytes_accessed=TM * K * 4 + K * N + (K // g) * N * 4 + TM * N * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, q, s)
    return out[:M, :N]


def quant_matmul(x, w: QuantArray, mode: str | None = None,
                 block_out: int = 512, block_in: int = 2048):
    """x [..., in] @ QuantArray([in, out]) -> [..., out] in x.dtype."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    out = _quant_matmul_2d(
        x2, w.q, w.s, w.group_size, block_out=block_out, block_in=block_in,
        out_dtype=x.dtype, mode=mode or _DEFAULT_MODE,
    )
    return out.reshape(*lead, w.q.shape[-1])

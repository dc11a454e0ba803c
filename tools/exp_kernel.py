#!/usr/bin/env python
"""Kernel bandwidth experiments for quant_matmul at decode shapes (M=8).

Variants:
  stream   — read int8 tiles, reduce-sum only (pure DMA ceiling at tile size)
  current  — the shipped kernel (dequant KxN in VMEM, bf16 MXU)
  outscale — group-segmented matmul, scales applied to the output
             (K/g x M x N VPU mults instead of K x N)
Each timed as REP iterations inside one jit (chained), fetch-synced.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REP = 32
G = 64


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(fn, *args):
    o = fn(*args); sync(o)
    t0 = time.perf_counter(); o = fn(*args); sync(o)
    return (time.perf_counter() - t0) / REP


def chain(call, x, w):
    """Run call(x, w) REP times with a data dependency between iterations."""
    K = x.shape[-1]

    @jax.jit
    def run(x, *wargs):
        def body(xx, _):
            o = call(xx, *wargs)
            bump = (o[..., :1] * 0).astype(xx.dtype)  # depend on o
            return xx + bump, o[0, 0]
        _, outs = lax.scan(body, x, length=REP)
        return outs
    return run, (x, *w)


# ---- stream-only kernel: measures DMA at the given tile size ----
def _stream_kernel(q_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0)
    acc_ref[0, 0] += jnp.sum(q_ref[:].astype(jnp.float32))

    @pl.when((k == pl.num_programs(1) - 1) & (pl.program_id(0) == pl.num_programs(0) - 1))
    def _():
        o_ref[0, 0] = acc_ref[0, 0]


def stream(q, tk, tn):
    K, N = q.shape
    grid = (N // tn, K // tk)
    return pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tk, tn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((1, 1), lambda j, k: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(q)


# ---- outscale kernel: int8->bf16 cast, group-segmented MXU, scale output ----
def _outscale_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    tk, tn = q_ref.shape
    ng = tk // G
    M = x_ref.shape[0]
    # [M, tk] x [tk, tn] per group: einsum('gmk,gkn->gmn') then scale+sum
    xg = x_ref[:].reshape(M, ng, G).transpose(1, 0, 2)  # [ng, M, G]
    qg = q_ref[:].astype(jnp.bfloat16).reshape(ng, G, tn)
    part = jax.lax.dot_general(
        xg.astype(jnp.bfloat16), qg,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [ng, M, tn] fp32
    acc_ref[:] += jnp.sum(part * s_ref[:][:, None, :], axis=0)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def outscale(x, q, s, tk=2048, tn=512):
    M, K = x.shape
    K2, N = q.shape
    tk = min(tk, K)
    tn = min(tn, N)
    n_n, n_k = N // tn, K // tk
    kern = functools.partial(_outscale_kernel, n_k=n_k)
    return pl.pallas_call(
        kern,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((M, tk), lambda j, k: (0, k)),
            pl.BlockSpec((tk, tn), lambda j, k: (k, j)),
            pl.BlockSpec((tk // G, tn), lambda j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((M, tn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, q, s)


def main():
    from kuiperllama_tpu.ops.pallas.quant_matmul import _quant_matmul_2d
    from kuiperllama_tpu.quant import quantize_q80

    key = jax.random.PRNGKey(0)
    shapes = {
        "wqkv": (2048, 2560), "wo": (2048, 2048),
        "w13": (2048, 11264), "w2": (5632, 2048), "lm_head": (2048, 32000),
    }
    M = 8
    for name, (K, N) in shapes.items():
        w = quantize_q80(jax.random.normal(key, (K, N), jnp.float32))
        q, s = jax.device_put(w.q), jax.device_put(w.s)
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        gb = (K * N + (K // G) * N * 4) / 1e9
        print(f"{name} [{K},{N}] {gb*1e3:.1f} MB:")

        for tk, tn in [(2048, 512), (1024, 512), (512, 512), (2048, 1024),
                       (1024, 1024), (512, 2048)]:
            if K % tk or N % tn:
                continue
            run, a = chain(lambda xx, qq: stream(qq, tk, tn), x, (q,))
            dt = timeit(run, *a)
            print(f"  stream  tk={tk:5d} tn={tn:5d}  {dt*1e6:7.1f}us {gb/dt:6.0f} GB/s")

        for bo, bi in [(512, 2048), (1024, 2048), (2048, 2048), (512, 1024),
                       (1024, 1024), (N, 2048)]:
            run, a = chain(
                lambda xx, qq, ss: _quant_matmul_2d(
                    xx, qq, ss, G, block_out=bo, block_in=bi), x, (q, s))
            dt = timeit(run, *a)
            print(f"  current bo={bo:5d} bi={bi:5d}  {dt*1e6:7.1f}us {gb/dt:6.0f} GB/s")



if __name__ == "__main__":
    main()

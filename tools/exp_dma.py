#!/usr/bin/env python
"""Probe: pure-DMA streaming rate of a Pallas grid kernel vs block shape,
dtype, and grid layout. Finds why exp_int8's (1, 4096, 2048) int8 blocks
streamed at only ~200 GB/s when the r4 megakernel sustains 550-650."""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_ref, o_ref, acc_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += w_ref[0, :1, :128].astype(jnp.float32)
    o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("nt",))
def run(w, nt):
    L, K, N = w.shape
    TN = N // nt
    return pl.pallas_call(
        _kernel,
        grid=(L, nt),
        in_specs=[pl.BlockSpec((1, K, TN), lambda l, t: (l, 0, t))],
        out_specs=pl.BlockSpec((1, 128), lambda l, t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
    )(w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    cases = [
        # (L, K, N, nt, dtype) — bytes/tile = K*N*itemsize/nt
        (96, 4096, 2048, 1, jnp.int8),    # exp_int8's failing shape
        (96, 4096, 2048, 4, jnp.int8),    # TN=512 (quant_matmul's tile)
        (96, 4096, 2048, 2, jnp.int8),
        (48, 4096, 2048, 1, jnp.bfloat16),  # same block bytes, bf16
        (96, 2048, 2560, 1, jnp.int8),    # TinyLlama wqkv-like (works in r4)
        (96, 4096, 1024, 1, jnp.int8),
        (96, 8192, 1024, 1, jnp.int8),    # tall-thin same bytes as failing
        (384, 1024, 2048, 1, jnp.int8),   # short rows, same total
    ]
    for (L, K, N, nt, dt) in cases:
        w = jnp.asarray(rng.integers(-127, 128, (L, K, N)), dt)
        nbytes = w.size * w.dtype.itemsize
        out = run(w, nt)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run(w, nt)
        jax.block_until_ready(out)
        dt_s = (time.perf_counter() - t0) / args.reps
        per_tile = dt_s / (L * nt) * 1e6
        print(f"L={L} K={K} N={N} nt={nt} {w.dtype.name:8s}: "
              f"{dt_s*1e3:7.3f} ms  {nbytes/dt_s/1e9:6.1f} GB/s  "
              f"({per_tile:5.1f} us/tile of {K*N*w.dtype.itemsize//nt//1024}KB)")


if __name__ == "__main__":
    main()

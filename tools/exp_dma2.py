#!/usr/bin/env python
"""Probe: does splitting one weight stream across multiple pallas operands
(= multiple concurrent block DMAs per grid step) raise streaming bandwidth?

exp_int8 measured a single (1, 4096, 2048) int8 block fetch + dot at
~230 GB/s — 1/3 of the 742 GB/s the XLA gemv emitter streams. Every block
here is genuinely read (full-tile dot), so the DMA cannot be narrowed."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, nsplit, subk):
    w_refs = refs[:nsplit]
    x_ref = refs[nsplit]
    o_ref = refs[nsplit + 1]
    acc_ref = refs[nsplit + 2]

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)  # [8, K]
    acc = None
    for r in w_refs:
        K, TN = r.shape[1], r.shape[2]
        P = None
        for i in range(K // subk):
            wc = r[0, i * subk:(i + 1) * subk, :].astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                x[:, i * subk:(i + 1) * subk], wc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            P = part if P is None else P + part
        psum = jnp.sum(P, axis=1, keepdims=True)  # [8, 1]
        acc = psum if acc is None else acc + psum
    acc_ref[:] += jnp.broadcast_to(acc[:1], acc_ref.shape)
    o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("nsplit", "subk"))
def run(w, x, nsplit, subk):
    L, K, N = w.shape
    TN = N // nsplit
    in_specs = [
        pl.BlockSpec((1, K, TN), functools.partial(
            lambda l, j=j: (l, 0, j))) for j in range(nsplit)
    ] + [pl.BlockSpec((8, K), lambda l: (0, 0))]
    return pl.pallas_call(
        functools.partial(_kernel, nsplit=nsplit, subk=subk),
        grid=(L,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 128), lambda l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
    )(*([w] * nsplit), x)


def main():
    rng = np.random.default_rng(0)
    L, K, N = 96, 4096, 2048
    w = jnp.asarray(rng.integers(-127, 128, (L, K, N)), jnp.int8)
    x = jnp.zeros((8, K), jnp.bfloat16).at[0].set(
        jnp.asarray(rng.standard_normal(K), jnp.bfloat16))
    nbytes = w.size
    for nsplit in (1, 2, 4, 8):
        for subk in (1024, 4096):
            out = run(w, x, nsplit, subk)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(10):
                out = run(w, x, nsplit, subk)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 10
            print(f"nsplit={nsplit} subk={subk}: {dt*1e3:7.3f} ms  "
                  f"{nbytes/dt/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()

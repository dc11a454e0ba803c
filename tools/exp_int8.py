#!/usr/bin/env python
"""Probe: s8 x s8 -> s32 MXU contraction inside a Pallas grid kernel vs the
bf16-cast block-diagonal GEMV the r4 megakernel uses.

Question (VERDICT r4 next-round #1b): can the in-kernel group-dequant GEMV
use true int8 MXU operands — quantizing the ACTIVATION row per group to
int8 so the whole contraction is s8xs8 — deleting both the int8->bf16
weight cast (~25 us/layer of VPU) and halving the MXU pass cost (int8 MXU
runs at 2x bf16 throughput)? Scales (weight-group x activation-group)
apply to the [ng, N] s32 partials in fp32, same as the bf16 path.

Measured end-to-end over a many-layer grid (marginal per-kernel timing
through the axon tunnel is garbage — memory: tpu-measurement-pitfalls):
walltime of ONE pallas_call with grid (L, NT) streaming an [L, K, N] int8
stack, reported as effective GB/s.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _kernel(w_ref, s_ref, x_ref, o_ref, acc_ref, *, g, mode, nt):
    t = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (t == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    K, N = w_ref.shape[1], w_ref.shape[2]
    ng = K // g
    x = x_ref[:]  # [1, K] bf16
    mask = (_iota2((ng, K), 0) == _iota2((ng, K), 1) // g)
    if mode == "bf16":
        A = mask.astype(jnp.bfloat16) * jnp.concatenate([x] * ng, axis=0)
        sub = 1024
        P = None
        for i in range(K // sub):
            wc = w_ref[0, i * sub:(i + 1) * sub, :].astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                A[:, i * sub:(i + 1) * sub], wc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            P = part if P is None else P + part
    else:  # int8 activations: per-group absmax quant of x
        xf = x.astype(jnp.float32)
        Af = mask.astype(jnp.float32) * jnp.concatenate([xf] * ng, axis=0)
        amax = jnp.max(jnp.abs(Af), axis=1, keepdims=True)  # [ng, 1]
        d = jnp.where(amax > 0, amax / 127.0, 1.0)
        Aq = jnp.round(Af / d).astype(jnp.int8)
        Pi = jax.lax.dot_general(
            Aq, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # [ng, N] exact
        P = Pi.astype(jnp.float32) * d
    y = jnp.sum(P * s_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    acc_ref[:] += y
    o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("g", "mode", "nt"))
def run(w, s, x, g, mode, nt):
    L, K, N = w.shape
    TN = N // nt
    return pl.pallas_call(
        functools.partial(_kernel, g=g, mode=mode, nt=nt),
        grid=(L, nt),
        in_specs=[
            pl.BlockSpec((1, K, TN), lambda l, t: (l, 0, t)),
            pl.BlockSpec((1, K // g, TN), lambda l, t: (l, 0, t)),
            pl.BlockSpec((1, K), lambda l, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TN), lambda l, t: (0, t)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
    )(w, s, x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=96)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--N", type=int, default=2048)
    ap.add_argument("--nt", type=int, default=1)
    ap.add_argument("--g", type=int, default=64)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    L, K, N, g = args.L, args.K, args.N, args.g
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-127, 128, (L, K, N)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.005, 0.02, (L, K // g, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
    nbytes = w.size + s.size * 4
    # fp32 oracle
    wf = np.asarray(w, np.float32).reshape(L, K // g, g, N)
    want = np.einsum("k,gkn->n",
                     np.asarray(x, np.float32)[0].reshape(K // g, g)[0] * 0, wf[0, 0]) # placeholder
    deq = (np.asarray(w[0], np.float32).reshape(K // g, g, N)
           * np.asarray(s[0])[:, None, :]).reshape(K, N)
    want_full = np.zeros((1, N), np.float32)
    for l in range(L):
        deq = (np.asarray(w[l], np.float32).reshape(K // g, g, N)
               * np.asarray(s[l])[:, None, :]).reshape(K, N)
        want_full += np.asarray(x, np.float32) @ deq
    for mode in ("bf16", "int8"):
        try:
            out = run(w, s, x, g, mode, args.nt)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = run(w, s, x, g, mode, args.nt)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.reps
            err = float(np.abs(np.asarray(out) - want_full).max()
                        / np.abs(want_full).max())
            print(f"{mode}: {dt*1e3:.3f} ms  {nbytes/dt/1e9:.1f} GB/s  "
                  f"rel_err {err:.2e}")
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe: in-kernel GEMV formulations at 7B tile shapes, TRUSTWORTHY timing.

Timing rule (memory: tpu-measurement-pitfalls + tools/roofline.py):
block_until_ready lies through the axon tunnel — every measurement chains
`reps` pallas_calls inside ONE jit fori_loop with a data dependence, ends
with a host fetch, and reports the marginal time between two trip counts.

Modes over an [L=32, K=4096, N=2048] int8 stack (one 7B-ish layer's qkv
worth of tiles per layer; grid (L,)):
  nodot     — full-tile read, trivial use (true DMA ceiling for 1 operand)
  bf16      — blockdiag A bf16 built in-kernel, sub-chunk cast + dot (r4)
  int8      — blockdiag A int8 quantized in-kernel, s8xs8->s32 dot
  plain8    — padded [8, K] bf16 operand, sub-chunk dequant + generic dot
  split4    — like bf16 but the tile arrives as 4 column sub-operands
              (4 concurrent block DMAs per grid step)
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _gemv_bf16(A, w_ref, s_ref, sub=1024):
    K = w_ref.shape[1]
    P = None
    for i in range(K // sub):
        wc = w_ref[0, i * sub:(i + 1) * sub, :].astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            A[:, i * sub:(i + 1) * sub], wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        P = part if P is None else P + part
    return jnp.sum(P * s_ref[0].astype(jnp.float32), axis=0, keepdims=True)


def _kernel(*refs, g, mode, nsplit):
    w_refs = refs[:nsplit]
    s_ref, x_ref, o_ref, acc_ref = refs[nsplit:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    K = w_refs[0].shape[1]
    ng = K // g
    x = x_ref[:]
    if mode == "nodot":
        y = None
        for r in w_refs:
            t = r[0, :8, :].astype(jnp.float32)  # touch; full fetch happens
            t2 = r[0, K - 8:, :].astype(jnp.float32)
            yy = jnp.sum(t + t2, axis=0, keepdims=True)
            y = yy if y is None else y + yy
        acc_ref[:, :y.shape[1]] += y
    elif mode in ("bf16", "split4"):
        mask = (_iota2((ng, K), 0) == _iota2((ng, K), 1) // g)
        A = mask.astype(jnp.bfloat16) * jnp.concatenate([x] * ng, axis=0)
        ys = []
        TN0 = 0
        for j, r in enumerate(w_refs):
            TN = r.shape[2]
            sj = s_ref[0, :, TN0:TN0 + TN]
            P = None
            sub = 1024
            for i in range(K // sub):
                wc = r[0, i * sub:(i + 1) * sub, :].astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    A[:, i * sub:(i + 1) * sub], wc,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                P = part if P is None else P + part
            ys.append(jnp.sum(P * sj.astype(jnp.float32), axis=0,
                              keepdims=True))
            TN0 += TN
        y = jnp.concatenate(ys, axis=1)
        acc_ref[:] += y
    elif mode in ("int8", "int8_split4"):
        xf = x.astype(jnp.float32)
        mask = (_iota2((ng, K), 0) == _iota2((ng, K), 1) // g)
        Af = mask.astype(jnp.float32) * jnp.concatenate([xf] * ng, axis=0)
        amax = jnp.max(jnp.abs(Af), axis=1, keepdims=True)
        d = jnp.where(amax > 0, amax / 127.0, 1.0)
        Aq = jnp.round(Af / d).astype(jnp.int8)
        ys = []
        TN0 = 0
        for r in w_refs:
            TN = r.shape[2]
            Pi = jax.lax.dot_general(
                Aq, r[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            P = Pi.astype(jnp.float32) * d
            ys.append(jnp.sum(
                P * s_ref[0, :, TN0:TN0 + TN].astype(jnp.float32),
                axis=0, keepdims=True))
            TN0 += TN
        y = jnp.concatenate(ys, axis=1)
        acc_ref[:] += y
    elif mode == "plain8":
        xb = jnp.concatenate([x] * 8, axis=0).astype(jnp.bfloat16)
        sub = 1024
        P = None
        for i in range(K // sub):
            qb = w_refs[0][0, i * sub:(i + 1) * sub, :].astype(jnp.bfloat16)
            sb = s_ref[0][i * (sub // g):(i + 1) * (sub // g)
                          ].astype(jnp.bfloat16)
            wd = (qb.reshape(sub // g, g, qb.shape[1])
                  * sb[:, None, :]).reshape(sub, qb.shape[1])
            part = jax.lax.dot_general(
                xb[:, i * sub:(i + 1) * sub], wd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            P = part if P is None else P + part
        acc_ref[:] += P[:1]
    o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("g", "mode", "nsplit", "reps"))
def run(w, s, x, g, mode, nsplit, reps):
    L, K, N = w.shape
    TN = N // nsplit

    def call(xi):
        in_specs = [
            pl.BlockSpec((1, K, TN), functools.partial(
                lambda l, j=j: (l, 0, j))) for j in range(nsplit)
        ] + [
            pl.BlockSpec((1, K // g, N), lambda l: (l, 0, 0)),
            pl.BlockSpec((1, K), lambda l: (0, 0)),
        ]
        return pl.pallas_call(
            functools.partial(_kernel, g=g, mode=mode, nsplit=nsplit),
            grid=(L,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, N), lambda l: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=116 * 1024 * 1024,
            ),
        )(*([w] * nsplit), s, xi)

    def body(i, xi):
        out = call(xi)
        # data dependence: next iteration's x depends on this one's output
        m = min(out.shape[1], xi.shape[1])
        return xi.at[:, :m].set(
            (xi[:, :m] + out[:, :m] * 1e-20).astype(xi.dtype))

    return lax.fori_loop(0, reps, body, x)


def measure(w, s, x, g, mode, nsplit, lo=4, hi=36, rounds=5):
    f_lo = functools.partial(run, w, s, x, g, mode, nsplit, lo)
    f_hi = functools.partial(run, w, s, x, g, mode, nsplit, hi)
    _ = np.asarray(f_lo()).ravel()[0]
    _ = np.asarray(f_hi()).ravel()[0]
    ests = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _ = np.asarray(f_lo()).ravel()[0]
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(f_hi()).ravel()[0]
        t_hi = time.perf_counter() - t0
        ests.append((t_hi - t_lo) / (hi - lo))
    return float(np.median(ests))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=64)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--N", type=int, default=2048)
    ap.add_argument("--g", type=int, default=64)
    ap.add_argument("--modes",
                    default="bf16,split4,int8,int8_split4,plain8")
    args = ap.parse_args()
    L, K, N, g = args.L, args.K, args.N, args.g
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-127, 128, (L, K, N)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.005, 0.02, (L, K // g, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
    nbytes = w.size + s.size * 4
    for mode in args.modes.split(","):
        nsplit = 4 if mode.endswith("split4") else 1
        try:
            dt = measure(w, s, x, g, mode, nsplit)
            print(f"{mode:8s}: {dt*1e3:7.3f} ms/pass  {nbytes/dt/1e9:6.1f} "
                  f"GB/s  ({dt/L*1e6:5.1f} us/tile)")
        except Exception as e:
            print(f"{mode:8s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

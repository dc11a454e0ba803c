#!/usr/bin/env python
"""Measure this chip's achievable HBM bandwidth and MXU throughput.

The BASELINE target is "decode >= roofline tokens/s/chip". Decode is
weight-bandwidth-bound, so the roofline ceiling is
    tokens/s = measured_HBM_GBps / bytes_touched_per_token.
This probe establishes the denominator empirically.

Methodology (the naive probe lies on this device):
  * `block_until_ready` through the axon tunnel does NOT wait for device
    completion — every timing must force a host fetch of a value that
    depends on the work.
  * Host fetch latency is ~26 ms, so each measurement runs the workload
    at two in-jit fori_loop trip counts and reports the marginal
    per-iteration time (fixed dispatch+fetch cost cancels).
  * Loop bodies carry data dependences and index rotating buffers so XLA
    can neither hoist nor fuse iterations away.

Measured on the round-2 chip ("TPU v5 lite" via axon):
  read 4-buffer sum      ~6xx GB/s
  gemv weight stream     ~570 GB/s   <- the decode-relevant number
  MXU bf16 4096^3        ~124 TFLOP/s
Prints one JSON dict.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def time_fetch(fn, *args, reps=4):
    """Best wall time of fn(*args) INCLUDING a scalar D2H fetch."""
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(mk_fn, args, lo: int, hi: int, rounds: int = 3) -> float:
    """Per-iteration seconds: median over `rounds` of
    (t(hi) - t(lo)) / (hi - lo).

    The tunnel's fixed dispatch+fetch cost varies by tens of ms between
    calls; a single (lo, hi) pair can come out wildly wrong (even negative).
    Each round re-times BOTH trip counts back to back (interleaved, so slow
    drift cancels) and the median round is reported. hi should be >= 4x lo
    so the marginal dwarfs the noise."""
    f_lo, f_hi = mk_fn(lo), mk_fn(hi)
    time_fetch(f_lo, *args, reps=1)  # compile both before timing
    time_fetch(f_hi, *args, reps=1)
    ests = []
    for _ in range(rounds):
        t_lo = time_fetch(f_lo, *args)
        t_hi = time_fetch(f_hi, *args)
        ests.append((t_hi - t_lo) / (hi - lo))
    return float(np.median(ests))


def probe_read(mb_per_buf: int = 256, n_bufs: int = 4):
    """Pure HBM read: sum rotating buffers (loop-variant, can't hoist)."""
    n = mb_per_buf * (1 << 20) // 2
    bufs = jnp.ones((n_bufs, n // 1024, 1024), jnp.bfloat16)

    def mk(reps):
        @jax.jit
        def f(bufs):
            def body(i, acc):
                b = lax.dynamic_index_in_dim(bufs, lax.rem(i, n_bufs), 0,
                                             keepdims=False)
                return acc + jnp.sum(b, dtype=jnp.float32)
            return lax.fori_loop(0, reps, body, jnp.float32(0))
        return f

    per = marginal(mk, (bufs,), 8, 64)
    return mb_per_buf * (1 << 20) / per / 1e9


def probe_gemv(K: int = 4096, N: int = 11008, M: int = 8, n_bufs: int = 4,
               dtype=jnp.bfloat16):
    """Decode-shaped weight-streaming matmul (the number that bounds
    tokens/s): [M, K] x [K, N], rotating weight buffers."""
    ws = jnp.ones((n_bufs, K, N), dtype)
    v = jnp.ones((M, K), jnp.bfloat16)

    def mk(reps):
        @jax.jit
        def f(v, ws):
            def body(i, v):
                w = lax.dynamic_index_in_dim(ws, lax.rem(i, n_bufs), 0,
                                             keepdims=False)
                o = lax.dot_general(v, w.astype(v.dtype),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                return (o[:, :K] * 1e-3).astype(v.dtype)
            return lax.fori_loop(0, reps, body, v)
        return f

    per = marginal(mk, (v, ws), 8, 64)
    return K * N * jnp.dtype(dtype).itemsize / per / 1e9


def probe_mxu(D: int = 4096):
    a = jnp.ones((D, D), jnp.bfloat16)

    def mk(reps):
        @jax.jit
        def f(c):
            def body(i, c):
                d = lax.dot_general(c, a, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                return (d * 1e-4).astype(jnp.bfloat16)
            return lax.fori_loop(0, reps, body, c)
        return f

    per = marginal(mk, (a,), 16, 128)
    return 2 * D**3 / per / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out", help="also write the dict to this path")
    args = ap.parse_args()

    d = jax.devices()[0]
    out = {
        "device": d.device_kind,
        "read_GBps": round(probe_read(), 1),
        "gemv_weightread_GBps": round(probe_gemv(), 1),
        "gemv_int8_GBps": round(probe_gemv(dtype=jnp.int8), 1),
        "mxu_bf16_TFLOPs": round(probe_mxu(), 1),
    }
    s = json.dumps(out)
    print(s)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(s + "\n")


if __name__ == "__main__":
    main()

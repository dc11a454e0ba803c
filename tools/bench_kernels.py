#!/usr/bin/env python
"""Per-shape quant_matmul device bandwidth at a model's decode shapes.

Methodology as tools/roofline.py: an in-jit fori_loop over rotating weight
buffers, timed at two trip counts including a host fetch (block_until_ready
through the axon tunnel does not wait; marginal time cancels the fixed
dispatch+fetch cost).

  python tools/bench_kernels.py --model llama2-7b [--m 1] [--block-out N]
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
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    return best


def bench_quant_shape(K, N, M, group_size=64, lo=8, hi=40,
                      block_out=512, block_in=2048):
    """One weight buffer, x varies per iteration (no CSE possible; TPUs have
    no cache between HBM and VMEM, so re-reading the same weight measures
    true stream bandwidth — rotating buffers via dynamic_index would force a
    copy of the weight before every pallas_call and poison the number)."""
    from kuiperllama_tpu.ops.pallas.quant_matmul import _quant_matmul_2d

    key = jax.random.PRNGKey(0)
    q = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
    s = jnp.full((K // group_size, N), 1e-3, jnp.float32)
    x = jnp.ones((M, K), jnp.bfloat16)

    def mk(reps):
        @jax.jit
        def f(x, q, s):
            def body(i, x):
                o = _quant_matmul_2d(
                    x, q, s, group_size,
                    block_out=block_out, block_in=block_in)
                # fold the [M, N] output back into a [M, K] carry
                o = jnp.tile(o, (1, -(-K // N)))[:, :K]
                return (o * 1e-3).astype(x.dtype)
            return lax.fori_loop(0, reps, body, x)
        return f

    t_lo = time_fetch(mk(lo), x, q, s)
    t_hi = time_fetch(mk(hi), x, q, s)
    per = (t_hi - t_lo) / (hi - lo)
    bytes_touched = K * N + (K // group_size) * N * 4
    return bytes_touched / per / 1e9, per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--block-out", type=int, default=512)
    ap.add_argument("--block-in", type=int, default=2048)
    ap.add_argument("--group-size", type=int, default=64)
    args = ap.parse_args()

    from kuiperllama_tpu.config import preset_config

    cfg = preset_config(args.model)
    d, h, kv, V = cfg.dim, cfg.hidden_dim, cfg.kv_dim, cfg.vocab_size
    shapes = {
        "wqkv": (d, d + 2 * kv),
        "wo": (d, d),
        "w13": (d, 2 * h),
        "w2": (h, d),
        "lm_head": (d, V),
    }
    out = {"model": args.model, "M": args.m,
           "block_out": args.block_out, "block_in": args.block_in}
    total_bytes, total_time = 0.0, 0.0
    for name, (K, N) in shapes.items():
        gbps, per = bench_quant_shape(
            K, N, args.m, group_size=args.group_size,
            block_out=args.block_out, block_in=args.block_in)
        out[name] = {"K": K, "N": N, "GBps": round(gbps, 1),
                     "us": round(per * 1e6, 1)}
        mult = cfg.n_layers if name != "lm_head" else 1
        total_bytes += mult * (K * N + (K // args.group_size) * N * 4)
        total_time += mult * per
    out["matmuls_only_ms_per_token"] = round(total_time * 1e3, 2)
    out["matmuls_only_GBps"] = round(total_bytes / total_time / 1e9, 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

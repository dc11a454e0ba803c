#!/usr/bin/env python
"""Per-shape quant_matmul device bandwidth at a model's decode shapes.

Methodology as tools/roofline.py: an in-jit fori_loop over the weight,
timed at two trip counts including a host fetch (block_until_ready
through the axon tunnel does not wait; the marginal time cancels the fixed
dispatch+fetch cost, and the median over interleaved rounds rejects the
tunnel's multi-ms jitter).

  python tools/bench_kernels.py --model llama2-7b [--m 1] [--block-out N]
      [--variant pallas|pallas-layered|xla] [--scales-dtype float32|bfloat16]
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


def marginal(mk_fn, args, lo: int, hi: int, rounds: int = 3) -> float:
    """Median-of-rounds marginal per-iteration seconds (see roofline.py)."""
    f_lo, f_hi = mk_fn(lo), mk_fn(hi)
    time_fetch(f_lo, *args, reps=1)
    time_fetch(f_hi, *args, reps=1)
    ests = []
    for _ in range(rounds):
        t_lo = time_fetch(f_lo, *args)
        t_hi = time_fetch(f_hi, *args)
        ests.append((t_hi - t_lo) / (hi - lo))
    return float(np.median(ests))


def bench_quant_shape(K, N, M, group_size=64, lo=8, hi=64,
                      block_out=512, block_in=2048, variant="pallas",
                      scales_dtype=jnp.float32, n_layers=1):
    """One weight buffer, x varies per iteration (no CSE possible; TPUs have
    no cache between HBM and VMEM, so re-reading the same weight measures
    true stream bandwidth — rotating buffers via dynamic_index would force a
    copy of the weight before every pallas_call and poison the number).

    variant "pallas-layered" stacks n_layers copies and walks them with the
    layer-indexed kernel (the production scan path)."""
    from kuiperllama_tpu.ops.pallas.quant_matmul import (
        _quant_matmul_2d, quant_matmul_layered)
    from kuiperllama_tpu.quant import QuantArray

    key = jax.random.PRNGKey(0)
    scale_bytes = jnp.dtype(scales_dtype).itemsize
    if variant == "pallas-layered":
        L = n_layers
        q = jax.random.randint(key, (L, K, N), -127, 128, jnp.int8)
        s = jnp.full((L, K // group_size, N), 1e-3, scales_dtype)
    else:
        L = 1
        q = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
        s = jnp.full((K // group_size, N), 1e-3, scales_dtype)
    x = jnp.ones((M, K), jnp.bfloat16)

    def mk(reps):
        @jax.jit
        def f(x, q, s):
            def body(i, x):
                if variant == "pallas":
                    o = _quant_matmul_2d(
                        x, q, s, group_size,
                        block_out=block_out, block_in=block_in)
                elif variant == "pallas-layered":
                    o = quant_matmul_layered(
                        x, QuantArray(q=q, s=s, group_size=group_size),
                        lax.rem(i, L), block_out=block_out,
                        block_in=block_in)
                elif variant == "xla":
                    G = K // group_size
                    w = (q.astype(jnp.bfloat16).reshape(G, group_size, N)
                         * s.astype(jnp.bfloat16)[:, None, :]).reshape(K, N)
                    o = lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype)
                else:
                    raise ValueError(variant)
                # fold the [M, N] output back into a [M, K] carry
                o = jnp.tile(o, (1, -(-K // N)))[:, :K]
                return (o * 1e-3).astype(x.dtype)
            return lax.fori_loop(0, reps, body, x)
        return f

    per = marginal(mk, (x, q, s), lo, hi)
    bytes_touched = K * N + (K // group_size) * N * scale_bytes
    return bytes_touched / per / 1e9, per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--block-out", type=int, default=512)
    ap.add_argument("--block-in", type=int, default=2048)
    ap.add_argument("--group-size", type=int, default=64)
    ap.add_argument("--variant", default="pallas",
                    choices=["pallas", "pallas-layered", "xla"])
    ap.add_argument("--scales-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--layers", type=int, default=4,
                    help="stack depth for --variant pallas-layered")
    ap.add_argument("--shapes", default=None,
                    help="comma list to restrict, e.g. wqkv,w2")
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
    if args.shapes:
        keep = set(args.shapes.split(","))
        shapes = {k: v for k, v in shapes.items() if k in keep}
    out = {"model": args.model, "M": args.m, "variant": args.variant,
           "scales_dtype": args.scales_dtype,
           "block_out": args.block_out, "block_in": args.block_in}
    sdt = jnp.dtype(args.scales_dtype).type
    total_bytes, total_time = 0.0, 0.0
    for name, (K, N) in shapes.items():
        gbps, per = bench_quant_shape(
            K, N, args.m, group_size=args.group_size,
            block_out=args.block_out, block_in=args.block_in,
            variant=args.variant, scales_dtype=sdt, n_layers=args.layers)
        out[name] = {"K": K, "N": N, "GBps": round(gbps, 1),
                     "us": round(per * 1e6, 1)}
        print(f"[{name}] K={K} N={N}: {gbps:.1f} GB/s  {per*1e6:.1f} us",
              file=sys.stderr)
        mult = cfg.n_layers if name != "lm_head" else 1
        sb = jnp.dtype(sdt).itemsize
        total_bytes += mult * (K * N + (K // args.group_size) * N * sb)
        total_time += mult * per
    if len(shapes) == 5:
        out["matmuls_only_ms_per_token"] = round(total_time * 1e3, 2)
        out["matmuls_only_GBps"] = round(total_bytes / total_time / 1e9, 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Trustworthy decode-step profiling: every measurement is a lax.scan of
serially-dependent iterations inside ONE jitted executable, so neither python
dispatch nor async pipelining can distort the numbers (the round-1 microbench
timed independent launches and under/over-counted badly).

Usage:
  python tools/profile2.py --model tinyllama-1.1b            # op breakdown
  python tools/profile2.py --model llama2-7b --cache-len 2048
  python tools/profile2.py --trace /tmp/tr                   # + profiler trace
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0  # v5e spec


def scan_time(make_step, carry0, iters=64, reps=3):
    """Time `iters` serially-dependent steps inside one jit. Returns s/step."""

    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (make_step(c), None), carry,
                            None, length=iters)[0]

    carry = run(carry0)  # compile
    jax.block_until_ready(carry)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = run(carry0)
        jax.block_until_ready(carry)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--trace", default=None, help="capture jax.profiler trace dir")
    ap.add_argument("--fp", action="store_true")
    args = ap.parse_args()

    from kuiperllama_tpu.config import preset_config
    from kuiperllama_tpu.fuse import fuse_params
    from kuiperllama_tpu.models import decoder
    from kuiperllama_tpu.ops.pallas.quant_matmul import quant_matmul
    from kuiperllama_tpu.params import param_bytes, random_params_device
    from kuiperllama_tpu.quant import quantize_q80
    from kuiperllama_tpu.serving.generate import decode_chunk

    cfg = preset_config(args.model, seq_len=args.cache_len)
    B = args.batch
    key = jax.random.PRNGKey(0)
    it = args.iters

    dim, hid, kvd = cfg.dim, cfg.hidden_dim, cfg.kv_dim
    shapes = {
        "wqkv": (dim, dim + 2 * kvd),
        "wo": (dim, dim),
        "w13": (dim, 2 * hid),
        "w2": (hid, dim),
        "lm_head": (dim, cfg.vocab_size),
    }
    print(f"== chained quant_matmul (B={B}) ==")
    total_layer = 0.0
    for name, (K, N) in shapes.items():
        w = quantize_q80(jax.random.normal(key, (K, N), jnp.float32))
        x0 = jax.random.normal(key, (B, K), jnp.bfloat16)

        def step(x, w=w, K=K):
            y = quant_matmul(x, w)  # [B, N]
            # feed output back (serialize iterations) at negligible cost
            return x * 0.999 + jnp.sum(y, axis=-1, keepdims=True) * 1e-9

        dt = scan_time(step, x0, iters=it)
        gb = (K * N + (K // w.group_size) * N * 4) / 1e9
        mark = "" if name == "lm_head" else f"  x{cfg.n_layers} = {dt*1e6*cfg.n_layers:7.0f}us"
        if name != "lm_head":
            total_layer += dt * cfg.n_layers
        print(f"  {name:8s} [{K:5d},{N:5d}]  {dt*1e6:7.1f}us  "
              f"{gb/dt:5.0f} GB/s ({100*gb/dt/HBM_GBPS:3.0f}%){mark}")
    print(f"  sum(layers) = {total_layer*1e3:.2f}ms + lm_head")

    # --- full decode step, chained exactly like decode_chunk does
    params = random_params_device(cfg, quantize=not args.fp, dtype=jnp.bfloat16)
    params = fuse_params(params)
    jax.block_until_ready(params)
    wbytes = param_bytes(params)
    cache = decoder.init_kv_cache(cfg, batch=B, max_len=args.cache_len,
                                  dtype=jnp.bfloat16)
    token = jnp.zeros((B,), jnp.int32)
    pos = jnp.full((B,), 17, jnp.int32)
    done = jnp.zeros((B,), bool)
    rng = jax.random.PRNGKey(0)
    stop = jnp.full((8,), -1, jnp.int32)

    def time_chunk(steps, cache, reps=3):
        # decode_chunk donates the cache: rethread the returned one each call
        toks, t2, p2, cache, d2, r2 = decode_chunk(
            cfg, params, token, pos, cache, done, rng, stop, steps=steps)
        jax.block_until_ready(toks)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            toks, t2, p2, cache, d2, r2 = decode_chunk(
                cfg, params, token, pos, cache, done, rng, stop, steps=steps)
            jax.block_until_ready(toks)
            best = min(best, (time.perf_counter() - t0) / steps)
        return best, cache

    dt, cache = time_chunk(it, cache)
    ideal = wbytes / HBM_GBPS / 1e9
    print(f"== decode_chunk/step: {dt*1e3:.3f}ms  ({B/dt:.0f} tok/s)  "
          f"weights {wbytes/1e9:.2f} GB -> roofline {ideal*1e3:.3f}ms "
          f"({100*ideal/dt:.0f}% of roofline)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            toks, t2, p2, cache, d2, r2 = decode_chunk(
                cfg, params, token, pos, cache, done, rng, stop, steps=8)
            jax.block_until_ready(toks)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()

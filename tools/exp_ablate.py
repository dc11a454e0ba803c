#!/usr/bin/env python
"""Decode-step ablation at chunk granularity (dispatch-noise-free).

Every measurement is a single jit'd lax.scan of N steps, so host dispatch
(expensive through the axon tunnel) amortizes away and we see device time.

Variants:
  * full int8 decode chunk at several cache lengths  (attention cost)
  * bf16 dense weights                               (quant kernel vs 2x bytes)
  * tiny vocab                                       (lm_head + sampling cost)
  * per-shape quant_matmul device GB/s via an in-jit scan of 64 calls
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


def time_once(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_chunk(cfg, params, cache_len, steps=64, B=1):
    from kuiperllama_tpu.models import decoder
    from kuiperllama_tpu.serving.generate import decode_chunk, _stop_array

    cache = decoder.init_kv_cache(cfg, batch=B, max_len=cache_len,
                                  dtype=jnp.bfloat16)
    token = jnp.zeros((B,), jnp.int32)
    pos = jnp.full((B,), 17, jnp.int32)
    done = jnp.zeros((B,), bool)
    rng = jax.random.PRNGKey(0)
    stop = _stop_array([-2])

    def run(token, pos, cache, done, rng):
        toks, token, pos, cache, done, rng = decode_chunk(
            cfg, params, token, pos, cache, done, rng, stop, steps=steps)
        return toks, token, pos, cache, done, rng

    # warm (compile); decode_chunk donates the cache so rebuild each call
    def call():
        c = decoder.init_kv_cache(cfg, batch=B, max_len=cache_len,
                                  dtype=jnp.bfloat16)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        out = run(token, pos, c, done, rng)
        jax.block_until_ready(out[0])
        return time.perf_counter() - t0

    call()
    best = min(call() for _ in range(3))
    return best / steps


def weight_bytes_per_token(params):
    from kuiperllama_tpu.quant import QuantArray

    total = 0
    for leaf in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, QuantArray)
    ):
        if isinstance(leaf, QuantArray):
            total += leaf.q.size + leaf.s.size * 4
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total


def kernel_scan_bench(shapes, B=1, n_iter=64):
    """Device GB/s per quant_matmul shape: scan n_iter dependent calls in one jit."""
    from kuiperllama_tpu.ops.pallas.quant_matmul import quant_matmul
    from kuiperllama_tpu.quant import quantize_q80

    key = jax.random.PRNGKey(0)
    print(f"== quant_matmul in-jit scan (M={B}, {n_iter} iters) ==")
    for name, (K, N) in shapes.items():
        w = quantize_q80(jax.random.normal(key, (K, N), jnp.float32))
        x = jax.random.normal(key, (B, K), jnp.bfloat16)

        @jax.jit
        def run(x, q, s, w=w):
            def body(x, _):
                y = quant_matmul(x, w)
                # feed a slice back so iterations are dependent (no DCE)
                return x + y[:, :K].astype(x.dtype) * 1e-9, ()
            x, _ = jax.lax.scan(body, x, length=n_iter)
            return x

        if N < K:
            # pad path differs; keep simple: output wide enough to slice K
            pass
        try:
            dt = time_once(run, x, w.q, w.s) / n_iter
        except Exception as e:  # noqa: BLE001
            print(f"  {name:8s} [{K:5d},{N:5d}]  FAILED {type(e).__name__}")
            continue
        gb = (K * N + (K // w.group_size) * N * 4) / 1e9
        print(f"  {name:8s} [{K:5d},{N:5d}]  {dt*1e6:7.1f}us  {gb/dt:6.0f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    from kuiperllama_tpu.config import preset_config
    from kuiperllama_tpu.fuse import fuse_params
    from kuiperllama_tpu.params import random_params_device

    B = args.batch
    cfg = preset_config(args.model, seq_len=2048)
    dim, hid, kvd = cfg.dim, cfg.hidden_dim, cfg.kv_dim
    shapes = {
        "wqkv": (dim, dim + 2 * kvd),
        "wo": (dim, dim),
        "w13": (dim, 2 * hid),
        "w2": (hid, dim),
        "lm_head": (dim, cfg.vocab_size),
    }
    kernel_scan_bench(shapes, B=B)

    params = fuse_params(random_params_device(cfg, quantize=True,
                                              dtype=jnp.bfloat16))
    wbytes = weight_bytes_per_token(params)
    print(f"weight bytes/token: {wbytes/1e9:.3f} GB  "
          f"(roofline @819GB/s: {819e9/wbytes:.0f} tok/s)")

    for cache_len in (256, 1024, 2048):
        dt = bench_chunk(cfg, params, cache_len, steps=args.steps, B=B)
        print(f"int8 chunk  cache={cache_len:5d}  {dt*1e3:7.3f} ms/tok  "
              f"{B/dt:6.0f} tok/s  {wbytes/dt/1e9:5.0f} GB/s eff")

    pf = fuse_params(random_params_device(cfg, quantize=False,
                                          dtype=jnp.bfloat16))
    wb = weight_bytes_per_token(pf)
    dt = bench_chunk(cfg, pf, 1024, steps=args.steps, B=B)
    print(f"bf16 chunk  cache= 1024  {dt*1e3:7.3f} ms/tok  {B/dt:6.0f} tok/s  "
          f"{wb/dt/1e9:5.0f} GB/s eff ({wb/1e9:.2f} GB/tok)")

    cfg_sv = cfg.replace(vocab_size=2048)
    ps = fuse_params(random_params_device(cfg_sv, quantize=True,
                                          dtype=jnp.bfloat16))
    dt = bench_chunk(cfg_sv, ps, 1024, steps=args.steps, B=B)
    print(f"int8 tiny-vocab cache=1024  {dt*1e3:7.3f} ms/tok  {B/dt:6.0f} tok/s")


if __name__ == "__main__":
    main()

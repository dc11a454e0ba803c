#!/usr/bin/env python
"""Decode-step time breakdown: per-shape quant_matmul microbench vs whole step.

Usage: python tools/profile_decode.py [--model tinyllama-1.1b]
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


def timeit(fn, *args, iters=50):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cache-len", type=int, default=1024)
    args = ap.parse_args()

    from kuiperllama_tpu.config import preset_config
    from kuiperllama_tpu.ops.pallas.quant_matmul import quant_matmul
    from kuiperllama_tpu.params import random_params_device
    from kuiperllama_tpu.fuse import fuse_params
    from kuiperllama_tpu.models import decoder
    from kuiperllama_tpu.quant import quantize_q80 as quantize

    cfg = preset_config(args.model, seq_len=args.cache_len)
    B = args.batch
    key = jax.random.PRNGKey(0)

    dim, hid, kvd = cfg.dim, cfg.hidden_dim, cfg.kv_dim
    shapes = {
        "wqkv": (dim, dim + 2 * kvd),
        "wo": (dim, dim),
        "w13": (dim, 2 * hid),
        "w2": (hid, dim),
        "lm_head": (dim, cfg.vocab_size),
    }
    total_layer = 0.0
    print(f"== quant_matmul microbench (M={B}) ==")
    for name, (K, N) in shapes.items():
        w = quantize(jax.random.normal(key, (K, N), jnp.float32))
        x = jax.random.normal(key, (B, K), jnp.bfloat16)
        dt = timeit(lambda x, q, s: quant_matmul(x, w),
                    x, w.q, w.s)
        gb = (K * N + (K // w.group_size) * N * 4) / 1e9
        per_layer = "" if name == "lm_head" else f"  x{cfg.n_layers} = {dt*1e6*cfg.n_layers:8.0f}us"
        if name != "lm_head":
            total_layer += dt * cfg.n_layers
        print(f"  {name:8s} [{K:5d},{N:5d}]  {dt*1e6:7.1f}us  {gb/dt:6.0f} GB/s{per_layer}")
    print(f"  sum(layers) + lm_head = {total_layer*1e3:.2f}ms + above")

    params = random_params_device(cfg, quantize=True, dtype=jnp.bfloat16)
    params = fuse_params(params)
    cache = decoder.init_kv_cache(cfg, batch=B, max_len=args.cache_len,
                                  dtype=jnp.bfloat16)
    token = jnp.zeros((B,), jnp.int32)
    pos = jnp.full((B,), 17, jnp.int32)

    @jax.jit
    def step(params, token, pos, cache):
        logits, cache = decoder.decode_step(cfg, params, token, pos, cache)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    dt = timeit(lambda p, t, q, c: step(p, t, q, c)[0], params, token, pos, cache,
                iters=30)
    print(f"== full decode_step: {dt*1e3:.2f}ms  ({1/dt:.0f} tok/s/B, B={B})")

    # step with donation (as the scan loop would run)
    step_d = jax.jit(step, donate_argnums=(3,))
    c2 = decoder.init_kv_cache(cfg, batch=B, max_len=args.cache_len,
                               dtype=jnp.bfloat16)
    t, c2 = step_d(params, token, pos, c2)
    jax.block_until_ready(c2)
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        t, c2 = step_d(params, token, pos, c2)
    jax.block_until_ready(c2)
    print(f"== donated decode_step: {(time.perf_counter()-t0)/N*1e3:.2f}ms")


if __name__ == "__main__":
    main()

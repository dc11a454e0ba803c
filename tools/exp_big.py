#!/usr/bin/env python
"""Geometry experiments for the big-model megakernel: run the bench decode
loop at a modified 7B geometry (e.g. hidden padded 11008 -> 11264 so the
FFN tiles in 22 phases of 512 instead of 43 of 256 — 11008 = 2^8 * 43 has
no mid-sized 128-multiple divisor) to attribute the per-iteration overhead.

  python tools/exp_big.py [--hidden 11264] [--steps 128] [--layers 32]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--hidden", type=int, default=0)
    ap.add_argument("--layers", type=int, default=0)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--group", type=int, default=64)
    args = ap.parse_args()

    from kuiperllama_tpu.config import preset_config
    from kuiperllama_tpu.fuse import fuse_params
    from kuiperllama_tpu.params import param_bytes, random_params_device
    from kuiperllama_tpu.quant import cast_scales
    from kuiperllama_tpu.serving.generate import Generator
    from kuiperllama_tpu.ops.pallas.fused_decode_big import plan_big

    cfg = preset_config(args.model, seq_len=max(args.cache_len, 256))
    over = {}
    if args.hidden:
        over["hidden_dim"] = args.hidden
    if args.layers:
        over["n_layers"] = args.layers
    if over:
        cfg = dataclasses.replace(cfg, **over)
    t0 = time.time()
    params = random_params_device(cfg, quantize=True, dtype=jnp.bfloat16,
                                  group_size=args.group)
    params = fuse_params(params)
    params = cast_scales(params, jnp.bfloat16)
    jax.block_until_ready(params)
    print(f"[exp] params {param_bytes(params)/1e9:.2f} GB "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)
    print(f"[exp] plan: {plan_big(params['blocks'], jnp.bfloat16, 256)}",
          file=sys.stderr)

    gen = Generator(cfg, params, cache_len=args.cache_len,
                    cache_dtype=jnp.bfloat16, chunk=args.steps)
    prompts = [list(range(5, 37))]
    gen.generate_batch_ids(prompts, max_new_tokens=8)
    best = 0.0
    for _ in range(3):
        rows, _, decode_s = gen.generate_batch_ids(
            prompts, max_new_tokens=args.steps)
        n = sum(len(r) for r in rows)
        tps = n / decode_s
        best = max(best, tps)
        print(f"[exp] {tps:.1f} tok/s", file=sys.stderr)
    bpt = param_bytes(params) - params["tok_emb"].size * 2
    kv = cfg.n_layers * 256 * cfg.n_kv_heads * cfg.head_dim * 2 * 2
    print(f"tok/s {best:.2f}  effective {(bpt+kv)*best/1e9:.1f} GB/s  "
          f"step {1e3/best:.2f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: single-chip INT8 greedy-decode throughput at the reference's
headline config (TinyLlama-1.1B; readme.md:25 reports 60.34 tok/s fp32 on an
RTX 3060 laptop — the only number the reference publishes). vs_baseline is
ours / 60.34.

Weights are synthesized on device (the benching harness has no network and
host->device tunnel transfers are slow); compute cost is identical to real
weights. Run `python bench.py --model llama2-7b` for the 7B roofline config.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

REFERENCE_TOKS_PER_S = 60.34  # /root/reference/readme.md:25


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--fp", action="store_true", help="bf16 weights, no quant")
    ap.add_argument("--no-fuse", action="store_true",
                    help="disable qkv/gate-up weight fusion")
    ap.add_argument("--engine", action="store_true",
                    help="continuous-batching serving bench (paged KV cache)")
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kuiperllama_tpu.config import preset_config
    from kuiperllama_tpu.params import param_bytes, random_params_device
    from kuiperllama_tpu.serving.generate import Generator

    cfg = preset_config(args.model, seq_len=max(args.cache_len, 256))
    t0 = time.time()
    params = random_params_device(cfg, quantize=not args.fp, dtype=jnp.bfloat16)
    if not args.no_fuse:
        from kuiperllama_tpu.fuse import fuse_params

        params = fuse_params(params)
    jax.block_until_ready(params)
    if args.verbose:
        print(f"[bench] {args.model} params {param_bytes(params)/1e9:.2f} GB "
              f"({time.time()-t0:.1f}s to init)", file=sys.stderr)

    if args.engine:
        _bench_engine(args, cfg, params)
        return

    gen = Generator(cfg, params, cache_len=args.cache_len,
                    cache_dtype=jnp.bfloat16, chunk=args.steps)
    prompts = [list(range(5, 5 + args.prompt_len))] * args.batch

    # warmup (compile)
    t0 = time.time()
    gen.generate_batch_ids(prompts, max_new_tokens=8)
    if args.verbose:
        print(f"[bench] warmup/compile {time.time()-t0:.1f}s", file=sys.stderr)

    best = 0.0
    for _ in range(3):
        rows, prefill_s, decode_s = gen.generate_batch_ids(
            prompts, max_new_tokens=args.steps
        )
        n_tokens = sum(len(r) for r in rows)
        tps = n_tokens / decode_s
        best = max(best, tps)
        if args.verbose:
            print(f"[bench] {n_tokens} tokens  prefill {prefill_s*1e3:.0f}ms  "
                  f"decode {decode_s:.3f}s  {tps:.1f} tok/s", file=sys.stderr)

    quant = "fp" if args.fp else "int8"
    print(json.dumps({
        "metric": f"{args.model} {quant} decode tokens/s/chip (B={args.batch})",
        "value": round(best, 2),
        "unit": "tokens/s",
        "vs_baseline": round(best / REFERENCE_TOKS_PER_S, 2),
    }))


def _bench_engine(args, cfg, params):
    """Continuous-batching serving benchmark: aggregate decode tokens/s and
    p50 TTFT over a queued request burst (BASELINE config: paged KV cache +
    continuous batching)."""
    import time

    import numpy as np

    from kuiperllama_tpu.serving.engine import PagedEngine, Request

    import jax.numpy as jnp

    eng = PagedEngine(
        cfg, params, max_batch=args.batch, max_len=args.cache_len,
        chunk=64, cache_dtype=jnp.bfloat16,
    )
    mk = lambda: [
        Request(prompt_ids=list(range(5, 5 + args.prompt_len)),
                max_new_tokens=args.steps)
        for _ in range(args.requests)
    ]
    eng.run(mk()[: args.batch])  # warm/compile

    t0 = time.time()
    done = eng.run(mk())
    wall = time.time() - t0
    total_tokens = sum(len(r.out_ids) for r in done)
    ttfts = sorted(r.ttft_s for r in done)
    p50_ttft = ttfts[len(ttfts) // 2]
    tps = total_tokens / wall
    if args.verbose:
        print(f"[bench] engine: {len(done)} reqs, {total_tokens} tokens in "
              f"{wall:.2f}s; p50 TTFT {p50_ttft * 1e3:.0f} ms", file=sys.stderr)
    quant = "fp" if args.fp else "int8"
    print(json.dumps({
        "metric": f"{args.model} {quant} continuous-batching decode tokens/s "
                  f"(paged KV, {args.requests} reqs, {args.batch} slots); "
                  f"p50 TTFT {p50_ttft * 1e3:.0f} ms",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / REFERENCE_TOKS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()

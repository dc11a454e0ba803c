#!/usr/bin/env python
"""Decode-step component ablation with bench-grade timing.

Times the SAME chunked generate loop as bench.py (host fetch per chunk; the
only timing that survives the axon tunnel's async dispatch), with individual
non-matmul components monkeypatched to near-no-ops. The delta vs baseline is
that component's true serialized cost per decode step.

  python tools/exp_step.py [--model llama2-7b] [--steps 128] [--batch 1]

jit caches are busted between variants with jax.clear_caches() (monkey-
patching a global that a traced function closed over does NOT invalidate
its cache entry).
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


def run_decode(cfg, params, steps, batch, cache_len):
    from kuiperllama_tpu.serving.generate import Generator

    gen = Generator(cfg, params, cache_len=cache_len,
                    cache_dtype=jnp.bfloat16, chunk=steps)
    prompts = [list(range(5, 37))] * batch
    gen.generate_batch_ids(prompts, max_new_tokens=8)  # compile
    best = 1e30
    for _ in range(3):
        rows, prefill_s, decode_s = gen.generate_batch_ids(
            prompts, max_new_tokens=steps)
        n = sum(len(r) for r in rows)
        best = min(best, decode_s / n * batch)
    return best  # seconds per decode step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--fp", action="store_true",
                    help="bf16 dense weights (no quant) — the qwen/fp "
                         "bench configuration")
    args = ap.parse_args()

    from kuiperllama_tpu import fuse
    from kuiperllama_tpu.config import preset_config
    from kuiperllama_tpu.models import decoder
    from kuiperllama_tpu.ops import rmsnorm as rmsnorm_mod
    from kuiperllama_tpu.ops import rope as rope_mod
    from kuiperllama_tpu.params import random_params_device
    from kuiperllama_tpu.quant import cast_scales

    cfg = preset_config(args.model, seq_len=max(args.cache_len, 256))
    params = fuse.fuse_params(
        random_params_device(cfg, quantize=not args.fp, dtype=jnp.bfloat16))
    if not args.fp:
        params = cast_scales(params, jnp.bfloat16)
    jax.block_until_ready(jax.tree.leaves(params)[0])

    results = {}

    def measure(tag):
        jax.clear_caches()
        t0 = time.time()
        dt = run_decode(cfg, params, args.steps, args.batch, args.cache_len)
        results[tag] = dt
        print(f"{tag:28s} {dt*1e3:7.3f} ms/step  {args.batch/dt:6.1f} tok/s "
              f"(+compile {time.time()-t0:.0f}s)", file=sys.stderr)

    measure("baseline")

    # --- attention -> q passthrough (keeps cache scatter + slices) ---------
    real_attn = decoder.attention_dense
    decoder.attention_dense = lambda q, k, v, pos, m=None: q
    measure("no_attention")
    decoder.attention_dense = real_attn

    # --- cache: scatter + layer slice removed (attention over garbage) -----
    orig_forward_inner = decoder.forward_inner
    real_attn2 = decoder.attention_dense

    def attn_dummy_cache(q, k_cache, v_cache, pos, m=None):
        return real_attn2(q, k_cache, v_cache, pos, m)

    # easiest: attention against a zeros cache of active size, no scatter
    # (approximated by no_attention above; skip)

    # --- rmsnorm -> scale-only (no reduction) ------------------------------
    real_norm = decoder.rmsnorm
    decoder.rmsnorm = lambda x, w, eps: x
    measure("no_rmsnorm")
    decoder.rmsnorm = real_norm

    # --- rope -> identity ---------------------------------------------------
    real_rope = decoder.apply_rope
    decoder.apply_rope = lambda x, s, c, style: x
    measure("no_rope")
    decoder.apply_rope = real_rope

    # --- sampling: argmax -> take logit 0 ----------------------------------
    from kuiperllama_tpu.serving import generate as gen_mod
    real_sample = gen_mod.sample_token
    gen_mod.sample_token = (
        lambda logits, rng, t, k, p: jnp.argmin(
            jnp.abs(logits[..., :1]), axis=-1).astype(jnp.int32) + 7)
    measure("no_argmax")
    gen_mod.sample_token = real_sample

    # --- everything off ----------------------------------------------------
    decoder.attention_dense = lambda q, k, v, pos, m=None: q
    decoder.rmsnorm = lambda x, w, eps: x
    decoder.apply_rope = lambda x, s, c, style: x
    gen_mod.sample_token = (
        lambda logits, rng, t, k, p: jnp.argmin(
            jnp.abs(logits[..., :1]), axis=-1).astype(jnp.int32) + 7)
    measure("matmuls_plus_cache_only")
    decoder.attention_dense = real_attn
    decoder.rmsnorm = real_norm
    decoder.apply_rope = real_rope
    gen_mod.sample_token = real_sample

    base = results["baseline"]
    out = {"model": args.model, "batch": args.batch,
           "steps": args.steps, "ms_per_step": {}}
    for tag, dt in results.items():
        out["ms_per_step"][tag] = round(dt * 1e3, 3)
        if tag != "baseline":
            out.setdefault("component_cost_ms", {})[tag.replace("no_", "")] = (
                round((base - dt) * 1e3, 3))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

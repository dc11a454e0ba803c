#!/usr/bin/env python
"""Paged decode-step breakdown at serving geometry.

Times decode_chunk_paged (the PagedEngine hot loop) and ablations:
  * full step
  * KV-scatter disabled (_DEBUG_SKIP_WRITES)
  * paged attention swapped for a zero stub (isolates the kernel)
so the 7B paged-vs-dense gap can be attributed.

Usage: python tools/profile_paged.py --model llama2-7b --batch 8
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--fp", action="store_true")
    args = ap.parse_args()

    from kuiperllama_tpu.config import preset_config
    from kuiperllama_tpu.fuse import fuse_params
    from kuiperllama_tpu.kvcache import PageAllocator, init_paged_cache
    from kuiperllama_tpu.models import paged
    from kuiperllama_tpu.ops.pallas.paged_attention import build_work_list
    from kuiperllama_tpu.params import param_bytes, random_params_device

    cfg = preset_config(args.model, seq_len=args.max_len)
    B, ps = args.batch, args.page_size
    params = fuse_params(
        random_params_device(cfg, quantize=not args.fp, dtype=jnp.bfloat16))
    jax.block_until_ready(params)
    print(f"[prof] params {param_bytes(params)/1e9:.2f} GB", file=sys.stderr)

    n_pages = B * (-(-args.max_len // ps)) + 1
    cache = init_paged_cache(cfg, n_pages=n_pages, page_size=ps,
                             dtype=jnp.bfloat16)
    k_pages, v_pages = cache.k_pages, cache.v_pages
    print(f"[prof] pool {2*k_pages.size*k_pages.dtype.itemsize/1e9:.2f} GB "
          f"({n_pages} pages)", file=sys.stderr)

    alloc = PageAllocator(n_pages=n_pages, page_size=ps, max_seqs=B,
                          max_len=args.max_len)
    pos0 = args.prompt_len
    for s in range(B):
        assert alloc.alloc_seq(s, pos0 + args.steps + 1)
    fb, fp_, ft, n_items = build_work_list(
        alloc.page_table, alloc.seq_lens, ps)

    token = jnp.full((B,), 7, jnp.int32)
    pos = jnp.full((B,), pos0, jnp.int32)
    done = jnp.zeros((B,), bool)
    rng = jax.random.PRNGKey(0)
    stop = jnp.asarray([-1], jnp.int32)
    pt = jnp.asarray(alloc.page_table)
    fb, fp_, ft, n_items = map(jnp.asarray, (fb, fp_, ft, n_items))

    def run(tag):
        nonlocal k_pages, v_pages
        kw = dict(steps=args.steps, page_size=ps)
        out = paged.decode_chunk_paged(
            cfg, params, token, pos, k_pages, v_pages, done, rng, stop,
            pt, fb, fp_, ft, n_items, **kw)
        k_pages, v_pages = out[3], out[4]
        np.asarray(out[0])  # force completion (block_until_ready is not
        # reliable on donated-output tuples through the axon tunnel)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = paged.decode_chunk_paged(
                cfg, params, token, pos, k_pages, v_pages, done, rng, stop,
                pt, fb, fp_, ft, n_items, **kw)
            k_pages, v_pages = out[3], out[4]
        np.asarray(out[0])
        dt = (time.perf_counter() - t0) / reps / args.steps
        print(f"[prof] {tag}: {dt*1e3:.2f} ms/step  "
              f"({B/dt:.1f} tok/s aggregate)")
        return dt

    full = run("full step")

    paged._DEBUG_SKIP_WRITES = True
    paged.decode_chunk_paged.clear_cache()
    no_writes = run("no KV scatter")

    real_attn = paged.paged_attention_flat

    def stub(q, *a, **k):
        Bq, H, hd = q.shape
        return (jnp.zeros((Bq, H, hd), jnp.float32),
                jnp.zeros((Bq, H), jnp.float32),
                jnp.ones((Bq, H), jnp.float32))

    paged.paged_attention_flat = stub
    paged.decode_chunk_paged.clear_cache()
    no_attn = run("no scatter, attention stubbed")

    paged.paged_attention_flat = real_attn
    paged._DEBUG_SKIP_WRITES = False
    paged.decode_chunk_paged.clear_cache()

    print(f"[prof] attribution: attention {1e3*(no_writes-no_attn):.2f} ms, "
          f"scatter {1e3*(full-no_writes):.2f} ms, "
          f"rest (matmuls+sampling) {1e3*no_attn:.2f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Quantified sequence-parallel evidence (VERDICT r4 weak #4): per-shard
page-READ bytes per decode step at 7B long-context scale, computed EXACTLY
from the work lists the kernels consume (valid even without sp real chips
— the work list IS what each shard's kernel walks), plus the host cost of
build_work_lists_sharded at serving scale.

  python tools/seqpar_bytes.py [--json-out SEQPAR_r05.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--page-size", type=int, default=128)
    args = ap.parse_args()

    from kuiperllama_tpu.config import preset_config
    from kuiperllama_tpu.parallel.seqpar import build_work_lists_sharded

    cfg = preset_config("llama2-7b")
    B, ctx, ps = args.batch, args.ctx, args.page_size
    kv_lane = cfg.n_kv_heads * cfg.head_dim
    page_bytes = ps * kv_lane * 2 * 2  # k + v, bf16

    # engine-realistic state: B sequences at ctx tokens, pages allocated
    # round-robin from a shared pool (the allocator hands out free pages in
    # order, so ownership interleaves across sequences exactly like this)
    mp = -(-ctx // ps)
    rows = []
    for sp in (1, 2, 4, 8):
        n_pages = B * mp + 1
        n_pages = -(-n_pages // sp) * sp
        pt = np.zeros((B, mp), np.int32)
        nxt = sp  # pages {s*P_local} are per-shard garbage, skip low ids
        ids = [p for p in range(n_pages)
               if p % (n_pages // sp) != 0]
        k = 0
        for b in range(B):
            for pi in range(mp):
                pt[b, pi] = ids[k % len(ids)]
                k += 1
        sl = np.full((B,), ctx, np.int32)

        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            fb, fp, ft, ni, cov = build_work_lists_sharded(
                pt, sl, ps, sp, n_pages)
        host_ms = (time.perf_counter() - t0) / reps * 1e3

        per_shard_pages = ni[:, 0].tolist()
        per_shard_bytes = [int(n) * page_bytes * cfg.n_layers
                           for n in per_shard_pages]
        total = sum(per_shard_bytes)
        rows.append(dict(
            sp=sp,
            pages_per_shard=per_shard_pages,
            page_read_bytes_per_shard_per_step=per_shard_bytes,
            max_shard_bytes=max(per_shard_bytes),
            total_bytes=total,
            # the headline claim: each shard reads ~1/sp of the pool
            max_shard_fraction=round(max(per_shard_bytes) / total, 4),
            build_work_lists_host_ms=round(host_ms, 3),
        ))
        print(json.dumps(rows[-1]), file=sys.stderr)

    out = dict(
        model="llama2-7b", batch=B, ctx=ctx, page_size=ps,
        kv_lane=kv_lane, n_layers=cfg.n_layers,
        page_bytes_per_layer=page_bytes,
        note="bytes are exact from the per-shard work lists the flash "
             "kernel walks (parallel/seqpar.build_work_lists_sharded); "
             "host_ms is the per-decode-chunk scheduler cost at this scale",
        rows=rows,
    )
    s = json.dumps(out, indent=2)
    print(s)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(s + "\n")


if __name__ == "__main__":
    main()

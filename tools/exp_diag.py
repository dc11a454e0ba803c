#!/usr/bin/env python
"""Sweep KT_DIAG_MAX (the block-diagonal GEMV path's group-count cap) over
the production M=1 reduction shapes that fall OFF the diag path at the old
cap of 64: TinyLlama w2 (K=5632, 88 groups), Llama-3.2-1B w2 (K=8192, 128),
Llama-2-7B w2 (K=11008, 172). Each setting runs in a FRESH interpreter
(KT_* env knobs are process-start-only — quant_matmul.py).

  python tools/exp_diag.py            # parent: sweeps + prints JSON
  python tools/exp_diag.py --child K N   # child: one measurement
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

SHAPES = [(5632, 2048), (8192, 2048), (11008, 4096)]
# cap 64 = the r3 default (these shapes take the generic sub-chunked path);
# cap 176 covers them all with the diag path — one measurement each
CAPS = [64, 176]


def child(K, N):
    from tools.bench_kernels import bench_quant_shape
    import jax.numpy as jnp

    gbps, per = bench_quant_shape(
        K, N, 1, group_size=64, block_out=512, block_in=4096,
        variant="pallas-layered", scales_dtype=jnp.bfloat16, n_layers=4)
    print(json.dumps({"GBps": round(gbps, 1), "us": round(per * 1e6, 2)}))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    out = {}
    for K, N in SHAPES:
        ng = K // 64
        out[f"K{K}_N{N}"] = row = {"groups": ng}
        for cap in CAPS:
            env = dict(os.environ, KT_DIAG_MAX=str(cap))
            tag = "diag" if ng <= cap else "generic"
            key = f"cap{cap}_{tag}"
            try:
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     str(K), str(N)],
                    capture_output=True, text=True, timeout=560, env=env)
                row[key] = json.loads(p.stdout.strip().splitlines()[-1])
            except Exception as e:  # noqa: BLE001
                row[key] = {"error": repr(e)[:200]}
            print(f"[{K}x{N}] cap={cap} ({tag}): {row[key]}",
                  file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

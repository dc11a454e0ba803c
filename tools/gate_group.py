#!/usr/bin/env python
"""Δppl gate for non-default quant GROUP sizes (r5: group=128 halves the
in-kernel block-diagonal partial rows and the scale stream — worth ~+3.5%
decode on the 7B headline — but the BASELINE |Δppl| <= 0.1 gate must hold
at the larger group too).

Reuses the COMMITTED tinychar fp checkpoint + held-out split (same corpus
protocol as tools/train_tiny.py), quantizes in memory at --group, and
evaluates both perplexities through the production kernel path.

  python tools/gate_group.py [--group 128] [--out GATE_PPL_G128_r05.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--ckpt", default="checkpoints/tinychar/tinychar.bin")
    ap.add_argument("--family", default="llama2")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from train_tiny import CORPUS, encode_bytes  # same held-out protocol

    from kuiperllama_tpu.checkpoint.binfmt import load_bin
    from kuiperllama_tpu.evaluate import quantization_ppl_delta
    from kuiperllama_tpu.params import to_device
    from kuiperllama_tpu.quant import quantize_q80

    text = open(CORPUS).read()
    ids = encode_bytes(text)
    heldout_ids = ids[int(len(ids) * 0.85):]

    cfg, pf = load_bin(args.ckpt, family=args.family)
    assert cfg.dim % args.group == 0 and cfg.hidden_dim % args.group == 0, (
        f"group {args.group} does not divide the gate model "
        f"(dim {cfg.dim}, hidden {cfg.hidden_dim})")
    pf = to_device(pf, dtype=jnp.float32)
    qb = dict(pf["blocks"])
    max_err = 0.0
    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        w = pf["blocks"][name]
        qa = quantize_q80(w, group_size=args.group)
        deq = (np.asarray(qa.q, np.float32).reshape(
            qa.q.shape[0], -1, args.group, qa.q.shape[-1])
            * np.asarray(qa.s)[:, : w.shape[-2] // args.group, None, :]
        ).reshape(w.shape)
        max_err = max(max_err, float(np.abs(deq - np.asarray(w)).max()))
        qb[name] = qa
    pq = dict(pf, blocks=qb)

    report = quantization_ppl_delta(cfg, pf, cfg, pq, heldout_ids,
                                    window=cfg.seq_len)
    report.update(
        family=args.family,
        corpus="tests/data/tinycorpus.txt (held-out 15%)",
        heldout_tokens=int(len(heldout_ids)),
        quant=f"group={args.group} int8 (in-memory requant of the "
              f"committed fp checkpoint)",
        kernel_mode=("pallas-fast-compiled"
                     if jax.default_backend() == "tpu"
                     else "pallas-fast-interpret"),
        max_abs_dequant_err=round(max_err, 6),
    )
    print(json.dumps(report, indent=2))
    out = args.out or os.path.join(
        os.path.dirname(args.ckpt), f"GATE_PPL_G{args.group}_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    sys.exit(0 if report["passes_gate"] else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Perplexity / quantization-quality gate CLI.

  python tools/ppl.py --model m.bin [--quant-model m.q8.bin] \
      [--tokenizer tok] [--text file.txt] [--window 256]

With both --model (fp32 v0) and --quant-model (v3), prints the Δppl report
and exits nonzero if the |Δppl| <= 0.1 gate fails (BASELINE.md).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--quant-model")
    ap.add_argument("--family", default="llama2")
    ap.add_argument("--tokenizer")
    ap.add_argument("--text", help="text file to evaluate (default: builtin)")
    ap.add_argument("--window", type=int, default=256)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from kuiperllama_tpu.checkpoint.binfmt import load_bin
    from kuiperllama_tpu.evaluate import perplexity, quantization_ppl_delta
    from kuiperllama_tpu.params import to_device
    from kuiperllama_tpu.tokenizer import load_tokenizer

    cfg, params = load_bin(args.model, family=args.family)
    params = to_device(params, dtype=jnp.float32)

    if args.tokenizer and args.text:
        tok = load_tokenizer(args.tokenizer, family=cfg.family,
                             vocab_size=cfg.vocab_size)
        with open(args.text) as f:
            stream = tok.encode(f.read())
    else:
        # deterministic synthetic stream — meaningful for DELTA-ppl only;
        # a real gate needs real text + trained weights (tools/train_tiny.py
        # owns that pipeline and commits its artifact)
        print("[ppl] WARNING: no --tokenizer/--text given — evaluating a "
              "RANDOM token stream. Absolute ppl is meaningless and the "
              "delta gate is a weak discriminator; pass real text for a "
              "real gate (see tools/train_tiny.py).", file=sys.stderr)
        rng = np.random.default_rng(0)
        stream = rng.integers(0, cfg.vocab_size,
                              size=8 * args.window).astype(np.int32)

    if args.quant_model:
        cfg_q, params_q = load_bin(args.quant_model, family=args.family,
                                   quantized=True)
        params_q = to_device(params_q, dtype=jnp.float32)
        report = quantization_ppl_delta(cfg, params, cfg_q, params_q,
                                        stream, window=args.window)
        print(json.dumps(report, indent=2))
        sys.exit(0 if report["passes_gate"] else 1)
    else:
        ppl = perplexity(cfg, params, stream, window=args.window)
        print(json.dumps({"ppl": ppl}))


if __name__ == "__main__":
    main()

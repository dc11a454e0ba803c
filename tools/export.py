#!/usr/bin/env python
"""Checkpoint exporter (reference: tools/export.py / export_qwen2.py).

Converts an HF model directory (config.json + safetensors) into the
llama2.c-style `.bin` formats the engine mmaps:
  --version 0  : v0 fp32
  --version 3  : v3 group-wise INT8 (Q8_0, default group 64)

No torch required — our own safetensors parser does the reading.

Usage:
  python tools/export.py out.bin --hf /path/to/hf_dir [--version 3] [--group 64]
  python tools/export.py out.bin --random llama2 [--version 0]   # test fixture
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kuiperllama_tpu.checkpoint.binfmt import write_v0, write_v3  # noqa: E402
from kuiperllama_tpu.checkpoint.hf import load_hf  # noqa: E402
from kuiperllama_tpu.config import tiny_config  # noqa: E402
from kuiperllama_tpu.params import random_params  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("filepath")
    ap.add_argument("--hf", help="HF model directory")
    ap.add_argument("--random", help="emit a random tiny fixture for FAMILY")
    ap.add_argument("--version", type=int, default=0, choices=[0, 3])
    ap.add_argument("--group", type=int, default=64)
    args = ap.parse_args()

    if args.hf:
        cfg, params = load_hf(args.hf)
    elif args.random:
        cfg = tiny_config(args.random)
        params = random_params(cfg)
    else:
        ap.error("one of --hf / --random is required")

    if args.version == 0:
        write_v0(args.filepath, cfg, params)
    else:
        err = write_v3(args.filepath, cfg, params, group_size=args.group)
        print(f"max quantization group error: {err:.5f}")
    print(f"wrote {args.filepath} ({os.path.getsize(args.filepath)} bytes) "
          f"family={cfg.family} dim={cfg.dim} L={cfg.n_layers}")


if __name__ == "__main__":
    main()

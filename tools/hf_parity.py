#!/usr/bin/env python
"""HF parity oracle (reference: hf_infer/llama3_infer.py, qwen2_infer.py —
used to eyeball-compare generations; here the comparison is automatic).

Runs the same prompt through transformers (torch CPU) and through this
framework from the SAME HF checkpoint directory, compares greedy token
streams and reports first divergence + max logit delta on the prompt.

  python tools/hf_parity.py --hf /path/to/hf_dir --prompt "hi" --steps 32
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf", required=True)
    ap.add_argument("--prompt", default="hi")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--atol", type=float, default=2e-4)
    args = ap.parse_args()

    import numpy as np
    import torch
    import jax.numpy as jnp
    from transformers import AutoModelForCausalLM, AutoTokenizer

    from kuiperllama_tpu.checkpoint.hf import load_hf
    from kuiperllama_tpu.models import decoder
    from kuiperllama_tpu.params import to_device
    from kuiperllama_tpu.serving.generate import Generator

    hf_tok = AutoTokenizer.from_pretrained(args.hf)
    hf = AutoModelForCausalLM.from_pretrained(
        args.hf, torch_dtype=torch.float32
    ).eval()

    cfg, params = load_hf(args.hf)
    params = to_device(params, dtype=jnp.float32)

    ids = hf_tok(args.prompt, return_tensors="pt").input_ids
    prompt_ids = ids[0].tolist()

    # prompt logits parity
    with torch.no_grad():
        ref_logits = hf(ids).logits.numpy()
    cache = decoder.init_kv_cache(cfg, 1, max_len=len(prompt_ids) + args.steps + 8)
    positions = np.arange(len(prompt_ids), dtype=np.int32)[None]
    logits, _ = decoder.forward(
        cfg, params, jnp.asarray(np.asarray(ids)), jnp.asarray(positions), cache
    )
    delta = np.abs(np.asarray(logits) - ref_logits).max()
    print(f"prompt logits max |Δ|: {delta:.2e}  (atol {args.atol})")

    # greedy decode parity
    with torch.no_grad():
        ref_out = hf.generate(ids, max_new_tokens=args.steps, do_sample=False)
    ref_ids = ref_out[0][len(prompt_ids):].tolist()

    gen = Generator(cfg, params, cache_len=len(prompt_ids) + args.steps + 8)
    got_ids, _, _ = gen.generate_ids(prompt_ids, max_new_tokens=args.steps)

    n = min(len(ref_ids), len(got_ids))
    div = next((i for i in range(n) if ref_ids[i] != got_ids[i]), None)
    if div is None and delta <= args.atol:
        print(f"PARITY OK: {n} greedy tokens identical")
        print("text:", hf_tok.decode(got_ids))
        sys.exit(0)
    print(f"PARITY FAIL: first divergence at step {div}")
    print("hf :", ref_ids[:16])
    print("us :", got_ids[:16])
    sys.exit(1)


if __name__ == "__main__":
    main()

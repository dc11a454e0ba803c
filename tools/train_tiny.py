#!/usr/bin/env python
"""Train a tiny char-level llama2-family model on the checked-in corpus and
run the INT8 quantization perplexity gate on REAL weights + REAL text.

The environment has no network, so the stories15M-class "real model" the
gate wants is produced here: the functional decoder (models/decoder.py) is
differentiable, so a minimal optax loop over tests/data/tinycorpus.txt
yields a genuinely-trained checkpoint (loss ~3.5 -> ~1.0 over training).
The model exports to v0 (fp32) and v3 (INT8 group quant) .bin files and the
|delta-ppl| <= 0.1 gate (BASELINE.md; supersedes the reference's printf at
tools/export.py:339-341) runs on held-out text with the PRODUCTION fast-mode
Pallas dequant matmul when on TPU.

  python tools/train_tiny.py --steps 800 --out checkpoints/tinychar
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

CORPUS = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                      "tinycorpus.txt")


def build_cfg(seq_len=128, family="llama2", dim=128, hidden_dim=384):
    from kuiperllama_tpu.config import ModelConfig

    # qwen2 flips qkv_bias=True, eps=1e-6, theta=1e6, half-split RoPE via
    # the family preset — the full reference-parity axis (qwen2.cpp)
    return ModelConfig.from_header(
        family=family, dim=dim, hidden_dim=hidden_dim, n_layers=4, n_heads=4,
        n_kv_heads=2, vocab_size=128, seq_len=seq_len, tied_embedding=False,
    )


def encode_bytes(text: str) -> np.ndarray:
    ids = np.frombuffer(text.encode("ascii", errors="replace"), np.uint8)
    return np.minimum(ids, 127).astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="default checkpoints/tinychar[_<family>]")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--hidden-dim", type=int, default=384,
                    help="dim/hidden must divide the quant group under "
                         "test (the r5 group-256 gate uses 256/512)")
    ap.add_argument("--family", default="llama2",
                    choices=["llama2", "llama3", "qwen2"],
                    help="qwen2 exercises qkv biases end-to-end: train -> "
                         "v0/v3-with-bias export -> load -> gate")
    ap.add_argument("--scan-chunk", type=int, default=25,
                    help="train steps per device call")
    args = ap.parse_args()
    if args.out is None:
        suffix = "" if args.family == "llama2" else f"_{args.family}"
        args.out = f"checkpoints/tinychar{suffix}"

    import optax

    from kuiperllama_tpu.config import tiny_config  # noqa: F401 (import check)
    from kuiperllama_tpu.checkpoint.binfmt import write_v0, write_v3
    from kuiperllama_tpu.evaluate import quantization_ppl_delta
    from kuiperllama_tpu.models import decoder
    from kuiperllama_tpu.params import random_params

    cfg = build_cfg(family=args.family, dim=args.dim,
                    hidden_dim=args.hidden_dim)
    text = open(CORPUS).read()
    ids = encode_bytes(text)
    split = int(len(ids) * 0.85)
    train_ids, heldout_ids = ids[:split], ids[split:]
    print(f"[train] corpus {len(ids)} chars, train {split}, "
          f"held-out {len(ids) - split}", file=sys.stderr)

    T = cfg.seq_len
    params = jax.tree.map(jnp.asarray, random_params(cfg, seed=args.seed))
    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)
    data = jnp.asarray(train_ids)

    def loss_fn(params, tokens):
        B, T1 = tokens.shape
        cache = decoder.init_kv_cache(cfg, batch=B, max_len=T1,
                                      dtype=jnp.float32)
        positions = jnp.broadcast_to(jnp.arange(T1, dtype=jnp.int32), (B, T1))
        logits, _ = decoder.forward_inner(cfg, params, tokens, positions,
                                          cache)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
        return jnp.mean(nll)

    @jax.jit
    def train_chunk(params, opt_state, key):
        def step(carry, k):
            params, opt_state = carry
            starts = jax.random.randint(k, (args.batch,), 0,
                                        data.shape[0] - T - 1)
            toks = jax.vmap(
                lambda s: jax.lax.dynamic_slice(data, (s,), (T + 1,))
            )(starts)
            loss, grads = jax.value_and_grad(loss_fn)(params, toks)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, args.scan_chunk)
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, losses

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    n_chunks = -(-args.steps // args.scan_chunk)
    for c in range(n_chunks):
        key, sub = jax.random.split(key)
        params, opt_state, losses = train_chunk(params, opt_state, sub)
        print(f"[train] step {(c + 1) * args.scan_chunk:4d}  "
              f"loss {float(losses[-1]):.4f}  ({time.time() - t0:.0f}s)",
              file=sys.stderr)

    # ---- export v0 + v3
    os.makedirs(args.out, exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    p0 = os.path.join(args.out, "tinychar.bin")
    p3 = os.path.join(args.out, "tinychar.q8.bin")
    write_v0(p0, cfg, host)
    max_err = write_v3(p3, cfg, host, group_size=64)
    print(f"[export] {p0} + {p3} (max group quant err {max_err:.5f})",
          file=sys.stderr)

    # ---- gate on held-out REAL text through the real loaders
    from kuiperllama_tpu.checkpoint.binfmt import load_bin
    from kuiperllama_tpu.params import to_device

    cfg0, pf = load_bin(p0, family=args.family)
    cfg3, pq = load_bin(p3, family=args.family, quantized=True)
    pf = to_device(pf, dtype=jnp.float32)
    pq = to_device(pq, dtype=jnp.float32)
    report = quantization_ppl_delta(cfg0, pf, cfg3, pq, heldout_ids,
                                    window=cfg.seq_len)
    report.update(
        family=args.family,
        qkv_bias=bool(cfg.qkv_bias),
        corpus="tests/data/tinycorpus.txt (held-out 15%)",
        heldout_tokens=int(len(heldout_ids)),
        train_steps=args.steps,
        final_train_loss=round(float(losses[-1]), 4),
        quant="v3 group=64 int8",
        kernel_mode=("pallas-fast-compiled"
                     if jax.default_backend() == "tpu"
                     else "pallas-fast-interpret"),
        max_group_quant_err=round(float(max_err), 6),
    )
    print(json.dumps(report, indent=2))
    with open(os.path.join(args.out, "GATE_PPL.json"), "w") as f:
        json.dump(report, f, indent=2)
    sys.exit(0 if report["passes_gate"] else 1)


if __name__ == "__main__":
    main()

"""Parameter pytree construction and device placement.

The reference materializes weights as mmap'd views copied tensor-by-tensor to
the GPU (kuiper/source/model/llama3.cpp:14-100 `to_cuda`). Here the weight set
is a plain pytree of jax.Arrays — XLA owns device memory — with all per-layer
tensors stacked along a leading L axis so the decoder can `lax.scan` over
layers (one compiled layer body instead of L unrolled copies).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .quant import QuantArray, pad_scale_rows, quantize_q80


def is_quant_leaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) >= {"q", "s", "group_size"}


def _round_up_srows(n: int) -> int:
    # scale-row alignment quantum: 16 covers both fp32 (needs 8) and bf16
    # (needs 16) sublane tiling, so cast_scales(bf16) never produces a
    # misaligned block for the whole-reduction kernel path
    return -(-n // 16) * 16


def to_device(params, dtype=jnp.float32, sharding_tree=None):
    """Move a numpy params pytree onto device.

    Float weights are cast to `dtype` (bf16 for the fast path); norm scales stay
    fp32 for accumulation accuracy; quant dict leaves become QuantArray (int8 q,
    fp32 s). `sharding_tree`, when given, must mirror the params structure with
    NamedSharding leaves (see parallel/shardings.py).
    """

    def put(x, sh):
        return jax.device_put(x, sh) if sh is not None else jnp.asarray(x)

    def convert(path, x, sh=None):
        if is_quant_leaf(x):
            qsh, ssh = (sh["q"], sh["s"]) if sh is not None else (None, None)
            # scale rows pad to a multiple of 8 on device (Mosaic cannot
            # address sub-8-sublane scale blocks; see QuantArray docstring)
            s = pad_scale_rows(np.asarray(x["s"], np.float32), multiple=16)
            return QuantArray(
                q=put(x["q"], qsh),
                s=put(s, ssh),
                group_size=int(x["group_size"]),
            )
        x = np.asarray(x)
        if x.dtype in (np.float32, np.float64):
            target = jnp.float32 if "norm" in path else dtype
            return put(x.astype(np.float32), sh).astype(target)
        return put(x, sh)

    out = {}
    for key, val in params.items():
        if key == "blocks":
            out[key] = {
                k: convert(k, v, None if sharding_tree is None else sharding_tree["blocks"].get(k))
                for k, v in val.items()
            }
        else:
            out[key] = convert(
                key, val, None if sharding_tree is None else sharding_tree.get(key)
            )
    return out


def random_params(
    cfg: ModelConfig,
    seed: int = 0,
    dtype=np.float32,
    scale: float = 0.02,
) -> dict:
    """Random-normal params (numpy, [in, out] orientation) for tests/benches."""
    rng = np.random.default_rng(seed)
    L, d, h, kv = cfg.n_layers, cfg.dim, cfg.hidden_dim, cfg.kv_dim

    def mat(*shape):
        return (rng.standard_normal(shape) * scale).astype(dtype)

    blocks = dict(
        attn_norm=np.ones((L, d), dtype),
        ffn_norm=np.ones((L, d), dtype),
        wq=mat(L, d, d),
        wk=mat(L, d, kv),
        wv=mat(L, d, kv),
        wo=mat(L, d, d),
        w1=mat(L, d, h),
        w2=mat(L, h, d),
        w3=mat(L, d, h),
    )
    if cfg.qkv_bias:
        blocks.update(bq=mat(L, d), bk=mat(L, kv), bv=mat(L, kv))
    tok_emb = mat(cfg.vocab_size, d)
    lm_head = (
        np.ascontiguousarray(tok_emb.T)
        if cfg.tied_embedding
        else mat(d, cfg.vocab_size)
    )
    return dict(
        tok_emb=tok_emb, blocks=blocks, final_norm=np.ones((d,), dtype), lm_head=lm_head
    )


def random_params_device(
    cfg: ModelConfig,
    seed: int = 0,
    dtype=jnp.bfloat16,
    quantize: bool = False,
    group_size: int = 64,
    scale: float = 0.02,
) -> dict:
    """Random params generated ON DEVICE in ONE jit call (no host->device
    transfer, and — critically through the high-latency axon tunnel — one
    dispatch instead of one per tensor). With quantize=True, matmul weights
    become QuantArray int8."""
    return _random_params_jit(
        jax.random.PRNGKey(seed), cfg, jnp.dtype(dtype).name, quantize,
        group_size, scale,
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _random_params_jit(key, cfg, dtype_name, quantize, group_size, scale):
    dtype = jnp.dtype(dtype_name)
    L, d, h, kv = cfg.n_layers, cfg.dim, cfg.hidden_dim, cfg.kv_dim

    keys = iter(jax.random.split(key, 16))

    def mat(*shape, quant=quantize):
        if quant:
            # synthesize int8 payload + scales directly: a normal->quantize
            # round-trip materializes fp32 intermediates (a 7B synth would
            # OOM a 16 GB chip); the bench compute is identical either way.
            # scale rows padded to a multiple of 8 (QuantArray docstring)
            q = jax.random.randint(next(keys), shape, -127, 128, jnp.int8)
            rows = _round_up_srows(shape[-2] // group_size)
            ns = shape[:-2] + (rows, shape[-1])
            s = jnp.full(ns, scale / 127.0, jnp.float32)
            return QuantArray(q=q, s=s, group_size=group_size)
        w = jax.random.normal(next(keys), shape, dtype) * jnp.asarray(
            scale, dtype)
        return w

    blocks = dict(
        attn_norm=jnp.ones((L, d), jnp.float32),
        ffn_norm=jnp.ones((L, d), jnp.float32),
        wq=mat(L, d, d),
        wk=mat(L, d, kv),
        wv=mat(L, d, kv),
        wo=mat(L, d, d),
        w1=mat(L, d, h),
        w2=mat(L, h, d),
        w3=mat(L, d, h),
    )
    if cfg.qkv_bias:
        blocks.update(
            bq=mat(L, d, quant=False), bk=mat(L, kv, quant=False),
            bv=mat(L, kv, quant=False),
        )
    tok_emb = jax.random.normal(next(keys), (cfg.vocab_size, d), jnp.float32) * scale
    lm_head = mat(d, cfg.vocab_size)
    return dict(
        tok_emb=tok_emb.astype(dtype),
        blocks=blocks,
        final_norm=jnp.ones((d,), jnp.float32),
        lm_head=lm_head,
    )


def param_bytes(params) -> int:
    leaves = jax.tree_util.tree_leaves(params)
    return sum(x.size * x.dtype.itemsize for x in leaves)

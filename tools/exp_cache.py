#!/usr/bin/env python
"""Experiment: KV-cache plumbing strategies for the nested scan decode loop.

A) current: cache in inner-scan carry via dynamic_index/dynamic_update per layer
B) scatter: single scatter into the full [L,B,S,KH,hd] carry per layer
C) xs/ys:   cache layers as inner-scan xs (sliced) and ys (rebuilt)
Each run as a 64-step outer scan (decode chunk), donated carry.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
from jax import lax

from kuiperllama_tpu.config import preset_config
from kuiperllama_tpu.fuse import fuse_params
from kuiperllama_tpu.models import decoder
from kuiperllama_tpu.ops.attention import attention_dense
from kuiperllama_tpu.ops.linear import linear
from kuiperllama_tpu.ops.rmsnorm import rmsnorm
from kuiperllama_tpu.ops.rope import apply_rope, gather_rope, rope_cache
from kuiperllama_tpu.params import random_params_device

cfg = preset_config("tinyllama-1.1b", seq_len=1024)
B, S, STEPS = 1, 1024, 64
params = fuse_params(random_params_device(cfg, quantize=True, dtype=jnp.bfloat16))
jax.block_until_ready(params)
hd = cfg.head_dim


def fwd(params, token, positions, k_all, v_all, mode):
    x = params["tok_emb"][token]  # [B,1,dim]
    sin, cos = rope_cache(cfg.seq_len, hd, cfg.rope_theta)
    s, c = gather_rope(sin, cos, positions)
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]

    def qkv_ffn(x, blk, k_cache, v_cache):
        h = rmsnorm(x, blk["attn_norm"], cfg.norm_eps)
        H = blk["wo"].shape[-2] // hd
        KH = (blk["wqkv"].shape[-1] - H * hd) // (2 * hd)
        qkv = linear(h, blk["wqkv"], blk.get("bqkv"))
        q = qkv[..., : H * hd].reshape(B, 1, H, hd)
        k = qkv[..., H * hd : (H + KH) * hd].reshape(B, 1, KH, hd)
        v = qkv[..., (H + KH) * hd :].reshape(B, 1, KH, hd)
        q = apply_rope(q, s, c, cfg.rope_style)
        k = apply_rope(k, s, c, cfg.rope_style)
        k_cache = k_cache.at[b_idx, positions].set(k.astype(k_cache.dtype))
        v_cache = v_cache.at[b_idx, positions].set(v.astype(v_cache.dtype))
        attn = attention_dense(q, k_cache, v_cache, positions, None)
        x = x + linear(attn.reshape(B, 1, H * hd), blk["wo"])
        h = rmsnorm(x, blk["ffn_norm"], cfg.norm_eps)
        hidden = blk["w2"].shape[-2]
        g13 = linear(h, blk["w13"])
        gate, up = g13[..., :hidden], g13[..., hidden:]
        act = (gate.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))
               ).astype(x.dtype) * up
        x = x + linear(act, blk["w2"])
        return x, k_cache, v_cache

    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)

    if mode == "A":
        def body(carry, scanned):
            x, k_all, v_all = carry
            blk, li = scanned
            kc = lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            vc = lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            x, kc, vc = qkv_ffn(x, blk, kc, vc)
            k_all = lax.dynamic_update_index_in_dim(k_all, kc, li, 0)
            v_all = lax.dynamic_update_index_in_dim(v_all, vc, li, 0)
            return (x, k_all, v_all), None
        (x, k_all, v_all), _ = lax.scan(body, (x, k_all, v_all),
                                        (params["blocks"], layer_ids))
    elif mode == "B":
        def body(carry, scanned):
            x, k_all, v_all = carry
            blk, li = scanned
            kc = lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            vc = lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            h = rmsnorm(x, blk["attn_norm"], cfg.norm_eps)
            H = blk["wo"].shape[-2] // hd
            KH = (blk["wqkv"].shape[-1] - H * hd) // (2 * hd)
            qkv = linear(h, blk["wqkv"], blk.get("bqkv"))
            q = qkv[..., : H * hd].reshape(B, 1, H, hd)
            k = qkv[..., H * hd : (H + KH) * hd].reshape(B, 1, KH, hd)
            v = qkv[..., (H + KH) * hd :].reshape(B, 1, KH, hd)
            q = apply_rope(q, s, c, cfg.rope_style)
            k = apply_rope(k, s, c, cfg.rope_style)
            # write into the FULL cache carry: dynamic_update_slice at
            # (li, 0, pos, 0, 0) — B=1 path; scatter for B>1
            kq = k.astype(k_all.dtype)[None]  # [1,B,1,KH,hd]
            vq = v.astype(v_all.dtype)[None]
            p0 = positions[0, 0]
            z = jnp.int32(0)
            k_all = lax.dynamic_update_slice(k_all, kq, (li, z, p0, z, z))
            v_all = lax.dynamic_update_slice(v_all, vq, (li, z, p0, z, z))
            # attention reads the (pre-update) layer slice plus new k/v is
            # already in kc? no — read updated slice:
            kc = lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            vc = lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            attn = attention_dense(q, kc, vc, positions, None)
            x = x + linear(attn.reshape(B, 1, H * hd), blk["wo"])
            h = rmsnorm(x, blk["ffn_norm"], cfg.norm_eps)
            hidden = blk["w2"].shape[-2]
            g13 = linear(h, blk["w13"])
            gate, up = g13[..., :hidden], g13[..., hidden:]
            act = (gate.astype(jnp.float32) * jax.nn.sigmoid(
                gate.astype(jnp.float32))).astype(x.dtype) * up
            x = x + linear(act, blk["w2"])
            return (x, k_all, v_all), None
        (x, k_all, v_all), _ = lax.scan(body, (x, k_all, v_all),
                                        (params["blocks"], layer_ids))
    elif mode == "C":
        def body(x, scanned):
            blk, kc, vc = scanned
            x, kc, vc = qkv_ffn(x, blk, kc, vc)
            return x, (kc, vc)
        x, (k_all, v_all) = lax.scan(body, x, (params["blocks"], k_all, v_all))

    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    return logits[:, 0], k_all, v_all


def make_chunk(mode):
    @jax.jit
    def chunk(params, token, pos, k_all, v_all):
        def step(carry, _):
            token, pos, k_all, v_all = carry
            logits, k_all, v_all = fwd(params, token[:, None], pos[:, None],
                                       k_all, v_all, mode)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, pos + 1, k_all, v_all), nxt
        (token, pos, k_all, v_all), toks = lax.scan(
            step, (token, pos, k_all, v_all), length=STEPS)
        return toks, token, pos, k_all, v_all
    return jax.jit(chunk, donate_argnums=(3, 4))


for mode in ("A", "B", "C"):
    shape = (cfg.n_layers, B, S, cfg.n_kv_heads, hd)
    k_all = jnp.zeros(shape, jnp.bfloat16)
    v_all = jnp.zeros(shape, jnp.bfloat16)
    token = jnp.zeros((B,), jnp.int32)
    pos = jnp.full((B,), 17, jnp.int32)
    chunk = make_chunk(mode)
    toks, token2, pos2, k_all, v_all = chunk(params, token, pos, k_all, v_all)
    jax.block_until_ready(toks)
    t0 = time.perf_counter()
    N = 3
    for _ in range(N):
        toks, token2, pos2, k_all, v_all = chunk(params, token, pos, k_all, v_all)
        jax.block_until_ready(toks)
    dt = (time.perf_counter() - t0) / N / STEPS
    print(f"mode {mode}: {dt*1e3:.3f} ms/token  ({1/dt:.0f} tok/s)")

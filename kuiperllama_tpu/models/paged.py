"""Decoder forward over the paged KV cache.

Two entry points mirroring the dense path (models/decoder.py):
  * prefill_paged  — one prompt row: causal self-attention over the prompt's
    own K/V (a fresh request has no prior context to read) + scatter of the
    prompt's K/V into its allocated pages;
  * decode_chunk_paged — scan of decode steps for the whole batch: each step
    scatters the new token's K/V into pages and runs the flash-decode paged
    attention kernel against the page pool.

The scheduler (serving/engine.py) owns page tables/allocator on host and
pre-extends each sequence's pages to cover a whole chunk before launching it;
not-yet-written page slots are masked by seq_lens inside the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..ops.attention import attention_dense
from ..ops.linear import linear
from ..ops.pallas.paged_attention import paged_attention_flat
from ..ops.rmsnorm import rmsnorm
from ..ops.rope import apply_rope, gather_rope
from ..ops.sampling import sample_token
from .decoder import build_rope


def _qkv(cfg, blk, x, s, c, B, T):
    hd = cfg.head_dim
    h = rmsnorm(x, blk["attn_norm"], cfg.norm_eps)
    if "wqkv" in blk:  # fused projection (fuse.py)
        H = blk["wo"].shape[-2] // hd
        KH = (blk["wqkv"].shape[-1] - H * hd) // (2 * hd)
        qkv = linear(h, blk["wqkv"], blk.get("bqkv"))
        q = qkv[..., : H * hd].reshape(B, T, H, hd)
        k = qkv[..., H * hd : (H + KH) * hd].reshape(B, T, KH, hd)
        v = qkv[..., (H + KH) * hd :].reshape(B, T, KH, hd)
    else:
        H = blk["wq"].shape[-1] // hd
        KH = blk["wk"].shape[-1] // hd
        q = linear(h, blk["wq"], blk.get("bq")).reshape(B, T, H, hd)
        k = linear(h, blk["wk"], blk.get("bk")).reshape(B, T, KH, hd)
        v = linear(h, blk["wv"], blk.get("bv")).reshape(B, T, KH, hd)
    q = apply_rope(q, s, c, cfg.rope_style)
    k = apply_rope(k, s, c, cfg.rope_style)
    return q, k, v, H, KH


def _mlp_residual(cfg, blk, x, attn_out, B, T, H, hd):
    x = x + linear(attn_out.reshape(B, T, H * hd), blk["wo"])
    h = rmsnorm(x, blk["ffn_norm"], cfg.norm_eps)
    if "w13" in blk:  # fused gate|up projection (fuse.py)
        hidden = blk["w2"].shape[-2]
        g13 = linear(h, blk["w13"])
        gate, up = g13[..., :hidden], g13[..., hidden:]
    else:
        gate = linear(h, blk["w1"])
        up = linear(h, blk["w3"])
    act = (gate.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))
           ).astype(x.dtype) * up
    return x + linear(act, blk["w2"])


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("k_pages", "v_pages"))
def prefill_paged(cfg: ModelConfig, params, tokens, prompt_len,
                  k_pages, v_pages, token_pages, token_offs):
    """Prefill one request. tokens [1, T]; token_pages/token_offs [T] map
    each prompt position to its (physical page, in-page offset).
    Returns (last_logits [1, vocab], k_pages, v_pages)."""
    B, T = tokens.shape
    hd = cfg.head_dim
    x = params["tok_emb"][tokens]
    sin, cos = build_rope(cfg)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    s, c = gather_rope(sin, cos, positions)
    slot = jnp.arange(T, dtype=jnp.int32)
    kv_mask = slot[None, :] < prompt_len

    def layer_body(carry, scanned):
        x, kp_all, vp_all = carry  # cache in carry: aliases in place
        blk, layer_idx = scanned
        kp = lax.dynamic_index_in_dim(kp_all, layer_idx, 0, keepdims=False)
        vp = lax.dynamic_index_in_dim(vp_all, layer_idx, 0, keepdims=False)
        q, k, v, H, KH = _qkv(cfg, blk, x, s, c, B, T)
        # causal self-attention over the prompt itself
        attn = attention_dense(q, k, v, positions, kv_mask)
        # scatter prompt K/V into pages: kp [P, KH, hd, ps], k[0] [T, KH, hd]
        kp = kp.at[token_pages, :, :, token_offs].set(
            k[0].astype(kp.dtype), mode="drop")
        vp = vp.at[token_pages, :, :, token_offs].set(
            v[0].astype(vp.dtype), mode="drop")
        x = _mlp_residual(cfg, blk, x, attn, B, T, H, hd)
        kp_all = lax.dynamic_update_index_in_dim(kp_all, kp, layer_idx, 0)
        vp_all = lax.dynamic_update_index_in_dim(vp_all, vp, layer_idx, 0)
        return (x, kp_all, vp_all), None

    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    (x, k_pages, v_pages), _ = lax.scan(
        layer_body, (x, k_pages, v_pages), (params["blocks"], layer_ids)
    )
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    last = logits[:, prompt_len - 1]
    return last, k_pages, v_pages


@partial(
    jax.jit,
    static_argnames=("cfg", "steps", "page_size", "temperature", "top_k", "top_p"),
    donate_argnames=("k_pages", "v_pages"),
)
def decode_chunk_paged(cfg: ModelConfig, params, token, pos, k_pages, v_pages,
                       done, rng, stop_ids, page_table_dev,
                       flat_b, flat_page, flat_tok0, n_items,
                       steps: int, page_size: int = 128,
                       temperature: float = 0.0, top_k: int = 0,
                       top_p: float = 1.0):
    """Run `steps` decode iterations over the paged cache.

    token/pos/done: [B] current state. page_table_dev: [B, max_pages] int32
    (device copy for locating the write page of each new token). The flat_*
    work list must cover each row's pages up to pos+steps (pre-extended by
    the scheduler); unwritten tail slots are masked via seq_lens = pos+1.
    Returns (tokens [B, steps], token, pos, k_pages, v_pages, done, rng).
    """
    B = token.shape[0]
    hd = cfg.head_dim
    sin, cos = build_rope(cfg)
    b_idx = jnp.arange(B, dtype=jnp.int32)

    def step(carry, _):
        token, pos, k_pages, v_pages, done, rng = carry
        x = params["tok_emb"][token][:, None]  # [B, 1, dim]
        s, c = gather_rope(sin, cos, pos[:, None])
        seq_lens = pos + 1
        write_page = page_table_dev[b_idx, pos // page_size]
        write_off = pos % page_size

        def layer_body(carry, scanned):
            x, kp_all, vp_all = carry
            blk, layer_idx = scanned
            kp = lax.dynamic_index_in_dim(kp_all, layer_idx, 0, keepdims=False)
            vp = lax.dynamic_index_in_dim(vp_all, layer_idx, 0, keepdims=False)
            q, k, v, H, KH = _qkv(cfg, blk, x, s, c, B, 1)
            kp = kp.at[write_page, :, :, write_off].set(
                k[:, 0].astype(kp.dtype), mode="drop")
            vp = vp.at[write_page, :, :, write_off].set(
                v[:, 0].astype(vp.dtype), mode="drop")
            attn = paged_attention_flat(
                q[:, 0], kp, vp, flat_b, flat_page, flat_tok0, n_items,
                seq_lens, page_size=page_size,
            )
            x = _mlp_residual(cfg, blk, x, attn[:, None], B, 1, H, hd)
            kp_all = lax.dynamic_update_index_in_dim(kp_all, kp, layer_idx, 0)
            vp_all = lax.dynamic_update_index_in_dim(vp_all, vp, layer_idx, 0)
            return (x, kp_all, vp_all), None

        layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        (x, k_pages, v_pages), _ = lax.scan(
            layer_body, (x, k_pages, v_pages), (params["blocks"], layer_ids)
        )
        x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
        logits = linear(x[:, 0], params["lm_head"]).astype(jnp.float32)

        rng, sub = jax.random.split(rng)
        nxt = sample_token(logits, sub, temperature, top_k, top_p)
        nxt = jnp.where(done, token, nxt)
        new_done = done | jnp.any(nxt[:, None] == stop_ids[None, :], axis=-1)
        new_pos = jnp.where(done, pos, pos + 1)
        return (nxt, new_pos, k_pages, v_pages, new_done, rng), nxt

    (token, pos, k_pages, v_pages, done, rng), toks = lax.scan(
        step, (token, pos, k_pages, v_pages, done, rng), length=steps
    )
    return jnp.transpose(toks), token, pos, k_pages, v_pages, done, rng

"""Pure-functional Llama-family decoder forward pass.

One parametric decoder serves Llama-2 / TinyLlama / Llama-3.x / Qwen2.5 —
the reference's two ~820-line model classes (kuiper/source/model/llama3.cpp,
qwen2.cpp) differ only in RoPE theta/pairing, rmsnorm eps, qkv bias and
tokenizer, all of which are runtime data in ModelConfig here.

TPU-first structure:
  * per-layer weights stacked on a leading L axis, `lax.scan` over layers —
    the layer body is compiled once, not L times;
  * one forward covers prefill (T = prompt len) and batched decode (T = 1);
    the reference instead re-runs its single-token path per prompt token
    (demo/main.cpp:18-41), which we deliberately do not copy;
  * static shapes everywhere: cache size, batch and T are compile-time; the
    only dynamic data are token ids and positions;
  * fp32 softmax/norm accumulation, bf16 (configurable) activations;
  * head counts are derived from the weight shapes, not the config, so the
    same body runs unchanged on a tensor-parallel shard inside `shard_map`
    (Megatron-style: wq/wk/wv/w1/w3 column-sharded, wo/w2 row-sharded with a
    psum over `tp_axis` — see parallel/sharded.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..ops.attention import attention_dense
from ..ops.linear import linear, linear_layered
from ..ops.rmsnorm import rmsnorm
from ..ops.rope import apply_rope, gather_rope, rope_cache


def _dus_write() -> bool:
    """KT_DUS_WRITE sweep knob (process-start-only): write the B=1 decode
    token's K/V via one dynamic_update_slice instead of the batched
    scatter. Safe only because decode positions are always in range (the
    drop-mode sentinel semantics matter only for admit prefills, which
    never hit the B=1/T=1 shape)."""
    import os

    return os.environ.get("KT_DUS_WRITE", "0") == "1"


def _layer_unroll() -> int:
    """Unroll factor for the layer scan (KT_UNROLL, process-start-only
    sweep knob like quant_matmul's KT_*): unrolling lets XLA's scheduler
    overlap consecutive layers' op boundaries at the cost of HLO size /
    compile time. The r4 A/B measured +3.6% at TinyLlama B=1 on this
    layered path (402 -> 416 tok/s at KT_UNROLL=4); small models have
    since moved to the fused_decode megakernel, and the unroll is untested
    at 7B (32 layers of HLO growth), so the default stays 1."""
    import os

    return int(os.environ.get("KT_UNROLL", "1"))


def init_kv_cache(cfg: ModelConfig, batch: int, max_len: Optional[int] = None,
                  dtype=jnp.float32, n_kv_heads: Optional[int] = None):
    """Dense KV cache [L, B, S, KH, hd] (reference: one [L, S, kv_dim] fp32
    block, llama3.cpp:469-475 — ours adds the batch dim)."""
    S = max_len or cfg.seq_len
    KH = n_kv_heads or cfg.n_kv_heads
    shape = (cfg.n_layers, batch, S, KH, cfg.head_dim)
    return dict(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def build_rope(cfg: ModelConfig):
    return rope_cache(cfg.seq_len, cfg.head_dim, cfg.rope_theta,
                      scaling=cfg.rope_scaling)


def forward_inner(cfg: ModelConfig, params, tokens, positions, kv_cache,
                  kv_len_mask=None, tp_axis: Optional[str] = None,
                  logits_all_gather: bool = True, last_pos=None):
    """Un-jitted forward body (jit/shard_map wrappers below).

    tokens:    int32 [B, T]
    positions: int32 [B, T] absolute positions (cache slot == position).
               Out-of-range positions (>= S) DROP their cache write — rows
               of an admit batch that must not touch the cache (already-
               active slots) pass a sentinel position.
    kv_cache:  dict(k, v) [L, B, S, KH_local, hd]; updated functionally.
    kv_len_mask: optional [B, S] bool of valid slots for ragged batches.
    tp_axis:   name of the tensor-parallel mesh axis when running as a
               shard_map body (adds psums after row-parallel matmuls).
    last_pos:  optional [B] int32 — compute logits ONLY at this token index
               per row (prefill wants the final real token's logits; the
               full [B, T, vocab] fp32 tensor is ~1 GB at 7B prefill
               shapes and its lm_head matmul is pure waste).

    Returns (logits fp32 [B, T_or_1, vocab_local_or_global], new_kv_cache).
    """
    B, T = tokens.shape
    hd = cfg.head_dim

    x = params["tok_emb"][tokens]  # [B, T, dim] in weight dtype
    sin, cos = build_rope(cfg)
    s, c = gather_rope(sin, cos, positions)  # [B, T, 1, hd/2]

    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]

    def maybe_psum(v):
        return lax.psum(v, tp_axis) if tp_axis else v

    blocks = params["blocks"]

    def layer_body(carry, layer_idx):
        # cache rides in the CARRY (not xs/ys): xs/ys would hold two full
        # [L, ...] cache buffers alive through the scan; a donated carry
        # updated with dynamic_update_index aliases in place.
        # Weights are NOT scanned over: scan xs would dynamic-slice every
        # layer's weights into a fresh buffer before each Pallas call
        # (custom-call operands can't fuse a slice) — the stacked arrays
        # stay whole and linear_layered indexes the layer inside the kernel.
        x, k_all, v_all = carry
        li = layer_idx
        h = rmsnorm(x, blocks["attn_norm"][li], cfg.norm_eps)
        # local (possibly sharded) head counts from the weight shapes;
        # "wqkv"/"w13" are the fused variants (fuse.py) — one kernel call
        if "wqkv" in blocks:
            H = blocks["wo"].shape[-2] // hd
            KH = (blocks["wqkv"].shape[-1] - H * hd) // (2 * hd)
            qkv = linear_layered(h, blocks["wqkv"], li, blocks.get("bqkv"))
            q = qkv[..., : H * hd]
            k = qkv[..., H * hd : (H + KH) * hd]
            v = qkv[..., (H + KH) * hd :]
        else:
            H = blocks["wq"].shape[-1] // hd
            KH = blocks["wk"].shape[-1] // hd
            q = linear_layered(h, blocks["wq"], li, blocks.get("bq"))
            k = linear_layered(h, blocks["wk"], li, blocks.get("bk"))
            v = linear_layered(h, blocks["wv"], li, blocks.get("bv"))
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, KH, hd)
        v = v.reshape(B, T, KH, hd)
        q = apply_rope(q, s, c, cfg.rope_style)
        k = apply_rope(k, s, c, cfg.rope_style)

        # Scatter new K/V straight into the STACKED cache at (layer, b, pos)
        # (the reference projects into cache slices, llama3.cpp:626-632).
        # Slicing the layer out of the carry and DUS-ing it back — the r2
        # structure — round-trips the whole [B, S, KH, hd] slice through HBM
        # four extra times per layer (~1.3 GB/step at 7B, ~15% of decode).
        # mode="drop": sentinel positions (>= S) must NOT clip to the last
        # slot — in-place admit prefills pass them for rows whose cache is
        # live (see serving.engine._admit_prefill).
        # B=1/T=1 decode (KT_DUS_WRITE sweep knob): a single
        # dynamic_update_slice instead of the scatter — decode positions
        # are always in range, so clamp-vs-drop semantics don't differ.
        if _dus_write() and k.shape[0] == 1 and k.shape[1] == 1:
            p0 = positions[0, 0]
            idx = (li, 0, p0, 0, 0)
            k_all = lax.dynamic_update_slice(
                k_all, k.astype(k_all.dtype)[None], idx)
            v_all = lax.dynamic_update_slice(
                v_all, v.astype(v_all.dtype)[None], idx)
        else:
            k_all = k_all.at[li, b_idx, positions].set(
                k.astype(k_all.dtype), mode="drop")
            v_all = v_all.at[li, b_idx, positions].set(
                v.astype(v_all.dtype), mode="drop")
        k_cache = lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
        v_cache = lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)

        attn = attention_dense(q, k_cache, v_cache, positions, kv_len_mask)
        x = x + maybe_psum(
            linear_layered(attn.reshape(B, T, H * hd), blocks["wo"], li))

        h = rmsnorm(x, blocks["ffn_norm"][li], cfg.norm_eps)
        if "w13" in blocks:
            hidden = blocks["w2"].shape[-2]
            g13 = linear_layered(h, blocks["w13"], li)
            gate, up = g13[..., :hidden], g13[..., hidden:]
        else:
            gate = linear_layered(h, blocks["w1"], li)
            up = linear_layered(h, blocks["w3"], li)
        act = (gate.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))
               ).astype(x.dtype) * up
        x = x + maybe_psum(linear_layered(act, blocks["w2"], li))
        return (x, k_all, v_all), None

    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    (x, new_k, new_v), _ = lax.scan(
        layer_body, (x, kv_cache["k"], kv_cache["v"]), layer_ids,
        unroll=_layer_unroll(),
    )
    if last_pos is not None:
        x = jnp.take_along_axis(
            x, last_pos[:, None, None].astype(jnp.int32), axis=1)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    if tp_axis and logits_all_gather:
        # lm_head is vocab-sharded; reassemble full logits for sampling
        logits = lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits, dict(k=new_k, v=new_v)


@partial(jax.jit, static_argnames=("cfg",))
def forward(cfg: ModelConfig, params, tokens, positions, kv_cache,
            kv_len_mask=None, last_pos=None):
    """Single-device jitted forward over [B, T] tokens."""
    return forward_inner(cfg, params, tokens, positions, kv_cache, kv_len_mask,
                         last_pos=last_pos)


def prefill(cfg: ModelConfig, params, tokens, kv_cache, prompt_lens=None,
            forward_fn=None):
    """Batched prefill of [B, T] prompts starting at position 0.

    prompt_lens: optional [B] int32 actual lengths (tokens beyond are padding).
    Returns (last_logits [B, vocab], new_cache): logits at each row's final
    real token.
    """
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    if prompt_lens is None:
        prompt_lens = jnp.full((B,), T, jnp.int32)
    S = kv_cache["k"].shape[2]
    slot = jnp.arange(S, dtype=jnp.int32)
    kv_len_mask = slot[None, :] < prompt_lens[:, None]
    fwd = forward_fn or forward
    # Explicit capability flag (NOT a try/except TypeError probe: a
    # forward_fn taking **kwargs would silently ignore last_pos and return
    # position-0 logits, and a genuine TypeError during tracing would
    # silently re-trace). The module-level `forward` supports it; custom
    # forward_fns opt in by setting `supports_last_pos = True`.
    if getattr(fwd, "supports_last_pos", fwd is forward):
        logits, cache = fwd(cfg, params, tokens, positions, kv_cache,
                            kv_len_mask, last_pos=prompt_lens - 1)
        return logits[:, 0], cache
    # forward_fn without last_pos support: full logits, slice after
    logits, cache = fwd(cfg, params, tokens, positions, kv_cache,
                        kv_len_mask)
    last = jnp.take_along_axis(
        logits, (prompt_lens - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    return last, cache


def decode_step(cfg: ModelConfig, params, token, pos, kv_cache,
                kv_len_mask=None, forward_fn=None):
    """One batched decode step. token: [B] int32, pos: [B] int32."""
    fwd = forward_fn or forward
    logits, cache = fwd(
        cfg, params, token[:, None], pos[:, None], kv_cache, kv_len_mask
    )
    return logits[:, 0], cache

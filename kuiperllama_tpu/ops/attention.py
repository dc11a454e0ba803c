"""Batched GQA attention over a dense KV cache.

Replaces the reference's one-token-one-head MHA kernels
(kuiper/source/op/kernels/cuda/mha_kernel.cu: one block per head, serial scan
over 0..pos) with a batched einsum formulation that XLA maps onto the MXU:
one call handles [B, T] query tokens against the full cache with causal +
length masking, covering both prefill (T = prompt length) and batched decode
(T = 1). fp32 softmax accumulation for parity with the reference's fp32 math.

The flash-decode paged-attention Pallas kernel (ops/pallas/paged_attention.py)
is the production path for long contexts; this is the oracle and the default
for short caches.
"""

import jax.numpy as jnp

NEG_INF = -1e30


def attention_dense(q, k_cache, v_cache, q_positions, kv_len_mask=None):
    """Attention of q against a dense cache where slot index == position.

    q:        [B, T, H, hd]
    k_cache:  [B, S, KH, hd]
    v_cache:  [B, S, KH, hd]
    q_positions: [B, T] int32 — absolute position of each query token.
    kv_len_mask: optional [B, S] bool — valid cache slots (defaults to
      slot <= q_position, the causal rule; pass explicitly for ragged batches).

    Returns [B, T, H, hd] in q.dtype.
    """
    B, T, H, hd = q.shape
    S, KH = k_cache.shape[1], k_cache.shape[2]
    kv_mul = H // KH

    qf = q.reshape(B, T, KH, kv_mul, hd).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    # fp32 inputs get true-fp32 contractions (the TPU default would run
    # them through bf16 passes, ~1e-3 — this is the parity oracle);
    # bf16-origin data loses nothing at default precision.
    prec = ("highest" if q.dtype == jnp.float32 else None)

    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    # scores: [B, T, KH, kv_mul, S]
    scores = jnp.einsum("btkmh,bskh->btkms", qf, kf, precision=prec) * scale

    slot = jnp.arange(S, dtype=jnp.int32)
    causal = slot[None, None, :] <= q_positions[:, :, None]  # [B, T, S]
    mask = causal
    if kv_len_mask is not None:
        mask = jnp.logical_and(mask, kv_len_mask[:, None, :])
    scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)

    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out = jnp.einsum("btkms,bskh->btkmh", probs, vf, precision=prec)
    return out.reshape(B, T, H, hd).astype(q.dtype)

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
from jax import lax

NEG_INF = -1e30

# Long-prompt prefill guard: the score tensor is [B, T, H, S] fp32 — at 7B
# with B=4, T=S=2048 that is ~2.1 GB per layer (plus exp/softmax
# temporaries), which OOMs a 16 GB chip on top of 6.8 GB weights and a
# multi-GB KV pool (the r3 long-context bench rows died exactly here).
# Above _BLOCK_THRESHOLD_BYTES the query axis is processed in _Q_BLOCK
# chunks via lax.map: the T split is embarrassingly parallel, so blocked
# output matches unblocked to XLA dot-vectorization noise (~1e-7 fp32) —
# only peak memory changes (bounded to [B, _Q_BLOCK, H, S]).
# The reference needs no analogue: its serial per-head scan
# (kuiper/source/op/kernels/cuda/mha_kernel.cu:61-130) is O(pos) memory.
_Q_BLOCK = 256
_BLOCK_THRESHOLD_BYTES = 192 * 1024 * 1024


def attention_dense(q, k_cache, v_cache, q_positions, kv_len_mask=None,
                    q_block=None):
    """Attention of q against a dense cache where slot index == position.

    q:        [B, T, H, hd]
    k_cache:  [B, S, KH, hd]
    v_cache:  [B, S, KH, hd]
    q_positions: [B, T] int32 — absolute position of each query token.
    kv_len_mask: optional [B, S] bool — valid cache slots (defaults to
      slot <= q_position, the causal rule; pass explicitly for ragged batches).
    q_block: query-axis block size for the memory-bounded path (None =
      auto: block only when the fp32 score tensor would exceed
      _BLOCK_THRESHOLD_BYTES and T divides evenly).

    Returns [B, T, H, hd] in q.dtype.
    """
    B, T, H, hd = q.shape
    S = k_cache.shape[1]
    if q_block is None:
        if (4 * B * T * H * S > _BLOCK_THRESHOLD_BYTES
                and T > _Q_BLOCK and T % _Q_BLOCK == 0):
            q_block = _Q_BLOCK
    if q_block and T > q_block and T % q_block == 0:
        nb = T // q_block
        q_blocks = jnp.moveaxis(q.reshape(B, nb, q_block, H, hd), 1, 0)
        p_blocks = jnp.moveaxis(q_positions.reshape(B, nb, q_block), 1, 0)
        out = lax.map(
            lambda args: _attention_full(args[0], k_cache, v_cache, args[1],
                                         kv_len_mask),
            (q_blocks, p_blocks),
        )
        return jnp.moveaxis(out, 0, 1).reshape(B, T, H, hd)
    return _attention_full(q, k_cache, v_cache, q_positions, kv_len_mask)


def _attention_full(q, k_cache, v_cache, q_positions, kv_len_mask=None):
    """Unblocked attention body (see attention_dense)."""
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


def attention_dense_parts(q, k_cache, v_cache, q_positions,
                          kv_len_mask=None):
    """attention_dense, but returning UNNORMALIZED flash-attention partials
    (acc [B, T, H, hd] fp32, m [B, T, H] fp32, l [B, T, H] fp32) instead of
    the softmax output — the combine-ready form sequence-parallel prefill
    needs: each shard scores its own slice of the keys, the partials merge
    exactly via ops.pallas.paged_attention.merge_flash_many (r5: this is
    what lets chunked prefill compose with seqpar page-dim sharding).

    Rows whose mask is empty return the flash identity (acc=0, m=NEG_INF,
    l=0) and vanish in the merge."""
    B, T, H, hd = q.shape
    S, KH = k_cache.shape[1], k_cache.shape[2]
    kv_mul = H // KH

    qf = q.reshape(B, T, KH, kv_mul, hd).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    prec = ("highest" if q.dtype == jnp.float32 else None)

    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    scores = jnp.einsum("btkmh,bskh->btkms", qf, kf, precision=prec) * scale
    slot = jnp.arange(S, dtype=jnp.int32)
    mask = slot[None, None, :] <= q_positions[:, :, None]
    if kv_len_mask is not None:
        mask = jnp.logical_and(mask, kv_len_mask[:, None, :])
    mask5 = mask[:, :, None, None, :]
    scores = jnp.where(mask5, scores, NEG_INF)
    m = jnp.max(scores, axis=-1)  # [B, T, KH, kv_mul]
    # exp(NEG_INF - NEG_INF) = 1 on fully-masked rows — zero them
    # explicitly so empty shards contribute the flash identity
    p = jnp.where(mask5, jnp.exp(scores - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("btkms,bskh->btkmh", p, vf, precision=prec)
    return (acc.reshape(B, T, H, hd), m.reshape(B, T, H),
            l.reshape(B, T, H))

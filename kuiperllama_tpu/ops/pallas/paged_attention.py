"""Flash-decode paged attention Pallas kernel.

TPU-native replacement for the reference's decode MHA kernel
(kuiper/source/op/kernels/cuda/mha_kernel.cu: one CUDA block per head
serially scanning cache slots 0..pos). Design, driven by how TPUs actually
run Pallas grids (sequentially, one core) and by DMA latency:

  * The scheduler flattens the batch's pages into ONE work list
    (flat_b[i], flat_page[i]) so the kernel is a single program whose DMA
    pipeline streams continuously across sequence boundaries — per-sequence
    grid programs would drain/refill the pipeline at every boundary and
    per-head DMAs (16KB) are latency-bound.
  * Pages are [P, KH, hd, ps]: page-major so one DMA fetches a page across
    ALL kv heads (contiguous KH*hd*ps block); tokens on the LANE dim
    (ps=128) because Mosaic requires 128-aligned DMA slices on lanes and
    head_dim is 64 on TinyLlama/Qwen2.5-0.5B.
  * Online softmax (flash running max/sum) per kv head; the q block for a
    kv head is its whole GQA query group [kv_mul, hd] (the reference
    indexes head/kv_mul per thread, mha_kernel.cu:60).
  * A sequence's accumulators finalize into the output when the work list
    moves to the next sequence (flat_b is sorted).

Inputs:
  q          [B, H, hd]           (decode: one token per sequence)
  k_pages    [P, KH, hd, ps]      (one layer's page pool)
  v_pages    [P, KH, hd, ps]
  page_table [B, max_pages] int32
  seq_lens   [B] int32            (valid tokens incl. the current one)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
N_SLOTS = 16  # DMA pipeline depth


def _kernel(
    # scalar prefetch
    flat_b_ref, flat_page_ref, flat_tok0_ref, n_items_ref, seq_lens_ref,
    # inputs
    q_ref, kp_ref, vp_ref,
    # outputs
    o_ref,
    # scratch
    kbuf, vbuf, sems, *, page_size: int, n_kv_heads: int, max_items: int,
):
    n_items = n_items_ref[0]
    B, KH, kv_mul, hd = q_ref.shape
    scale = jax.lax.rsqrt(jnp.float32(hd))

    def dma(slot, i):
        page = flat_page_ref[i]
        return (
            pltpu.make_async_copy(kp_ref.at[page], kbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(vp_ref.at[page], vbuf.at[slot], sems.at[slot, 1]),
        )

    for w in range(N_SLOTS - 1):
        @pl.when(w < n_items)
        def _(w=w):
            kd, vd = dma(w, w)
            kd.start()
            vd.start()

    def body(i, carry):
        m, l, acc = carry  # [KH, kv_mul, 1] x2, [KH, kv_mul, hd]
        slot = jax.lax.rem(i, N_SLOTS)
        ahead = i + N_SLOTS - 1

        @pl.when(ahead < n_items)
        def _():
            kd, vd = dma(jax.lax.rem(ahead, N_SLOTS), ahead)
            kd.start()
            vd.start()

        kd, vd = dma(slot, i)
        kd.wait()
        vd.wait()

        b = flat_b_ref[i]
        seq_len = seq_lens_ref[b]
        token_idx = flat_tok0_ref[i] + jax.lax.broadcasted_iota(
            jnp.int32, (kv_mul, page_size), 1
        )
        valid = token_idx < seq_len

        outs = []
        for h in range(n_kv_heads):
            k = kbuf[slot, h].astype(jnp.float32)  # [hd, ps]
            v = vbuf[slot, h].astype(jnp.float32)
            qh = q_ref[b, h].astype(jnp.float32)  # dynamic ref read
            s = jax.lax.dot_general(
                qh, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [kv_mul, ps]
            s = jnp.where(valid, s, NEG_INF)
            m_new = jnp.maximum(m[h], jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m[h] - m_new)
            l_new = l[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc[h] * corr + jax.lax.dot_general(
                p, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((m_new, l_new, acc_new))
        m = jnp.stack([o[0] for o in outs])
        l = jnp.stack([o[1] for o in outs])
        acc = jnp.stack([o[2] for o in outs])

        # finalize when the NEXT item belongs to a different sequence
        is_last = jnp.logical_or(
            i + 1 >= n_items,
            flat_b_ref[jnp.minimum(i + 1, max_items - 1)] != b,
        )

        @pl.when(is_last)
        def _():
            o_ref[b] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        fresh = jnp.where(is_last, 0.0, 1.0)
        m = jnp.where(is_last, NEG_INF, m)
        l = l * fresh
        acc = acc * fresh
        return m, l, acc

    m0 = jnp.full((KH, kv_mul, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((KH, kv_mul, 1), jnp.float32)
    acc0 = jnp.zeros((KH, kv_mul, hd), jnp.float32)
    jax.lax.fori_loop(0, n_items, body, (m0, l0, acc0))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def build_work_list(page_table, seq_lens, page_size: int):
    """Flatten (sorted-by-sequence) pages of all sequences into the kernel's
    work list. Host-side numpy (the scheduler owns these arrays).

    Returns (flat_b, flat_page, flat_tok0, n_items) with flat arrays padded
    to page_table.size (padding repeats the last item; the kernel stops at
    n_items).
    """
    import numpy as np

    B, max_pages = page_table.shape
    fb, fp, ft = [], [], []
    for b in range(B):
        n = -(-int(seq_lens[b]) // page_size) if seq_lens[b] > 0 else 0
        for pi in range(n):
            fb.append(b)
            fp.append(int(page_table[b, pi]))
            ft.append(pi * page_size)
    n_items = len(fb)
    total = max(B * max_pages, 1)
    if n_items == 0:
        fb, fp, ft = [0], [0], [0]
    while len(fb) < total:
        fb.append(fb[-1]); fp.append(fp[-1]); ft.append(ft[-1])
    return (np.asarray(fb, np.int32), np.asarray(fp, np.int32),
            np.asarray(ft, np.int32), np.asarray([n_items], np.int32))


@functools.partial(jax.jit, static_argnames=("page_size",))
def paged_attention_flat(q, k_pages, v_pages, flat_b, flat_page, flat_tok0,
                         n_items, seq_lens, page_size: int = 128):
    """q [B, H, hd] against one layer's paged K/V via a flat work list
    (see build_work_list). Returns [B, H, hd]."""
    B, H, hd = q.shape
    P, KH, _, ps = k_pages.shape
    assert ps == page_size, (ps, page_size)
    kv_mul = H // KH
    max_items = flat_b.shape[0]

    qg = q.reshape(B, KH, kv_mul, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, KH, kv_mul, hd), lambda *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, KH, kv_mul, hd), lambda *_: (0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, KH, hd, ps), k_pages.dtype),
            pltpu.VMEM((N_SLOTS, KH, hd, ps), v_pages.dtype),
            pltpu.SemaphoreType.DMA((N_SLOTS, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel, page_size=ps, n_kv_heads=KH, max_items=max_items
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, kv_mul, hd), q.dtype),
        interpret=_interpret(),
    )(flat_b, flat_page, flat_tok0, n_items, seq_lens, qg, k_pages, v_pages)
    return out.reshape(B, H, hd)


def paged_attention(q, k_pages, v_pages, page_table, seq_lens,
                    page_size: int = 128):
    """Convenience wrapper building the work list on host from numpy
    page_table/seq_lens (jax arrays are pulled to host — prefer
    paged_attention_flat inside jitted steps)."""
    import numpy as np

    pt = np.asarray(page_table)
    sl = np.asarray(seq_lens)
    fb, fp, ft, n = build_work_list(pt, sl, page_size)
    return paged_attention_flat(
        q, k_pages, v_pages, jnp.asarray(fb), jnp.asarray(fp),
        jnp.asarray(ft), jnp.asarray(n), jnp.asarray(sl),
        page_size=page_size,
    )

"""Flash-decode paged attention Pallas kernel.

TPU-native replacement for the reference's decode MHA kernel
(kuiper/source/op/kernels/cuda/mha_kernel.cu: one CUDA block per head
serially scanning cache slots 0..pos). Design, driven by how TPUs actually
run Pallas grids (sequentially, one core), by DMA latency, and by what XLA
can update IN PLACE inside a scan:

  * Page layout is [P, ps, KH*hd] — tokens on the SUBLANE dim, kv heads
    head-major on the LANE dim. This is the load-bearing choice: a decode
    step appends one token per sequence, and with tokens on sublanes that
    write is a single contiguous dynamic_update_slice per row, which XLA
    keeps in place through the scan carry. Any lane-scattered layout forces
    a jnp/lax scatter, and a scatter whose result feeds a pallas_call gets
    copy-inserted — measured 13.4 ms per layer (a full copy of a 7B pool)
    vs 0.06 ms for the DUS form, a 26x whole-engine regression.
    The lane dim KH*hd is a multiple of 128 for every supported family
    (Mosaic requires a DMA'd ref's minor dim 128-aligned; hd alone is 64 on
    TinyLlama/Qwen2.5-0.5B, so heads are folded into lanes, not sublanes).
  * The scheduler flattens the batch's pages into ONE work list
    (flat_b[i], flat_page[i]) so the kernel is a single program whose DMA
    pipeline streams continuously across sequence boundaries — per-sequence
    grid programs would drain/refill the pipeline at every boundary.
  * All kv heads of a page contract in ONE MXU call each way (the round-1
    kernel looped Python-side over kv heads, issuing KH tiny matmuls — 32
    unrolled M=1 matmuls per page at Llama-2-7B's MHA geometry):
      scores = q_exp [H, KH*hd] @ k_page^T [ps, KH*hd]  -> [H, ps]
      out    = p     [H, ps]    @ v_page   [ps, KH*hd]  -> [H, KH*hd]
    where q_exp places head h's query in its own kv head's hd-lane block
    and EXACT ZEROS elsewhere — cross-head lanes contribute 0 to the dot,
    so no -inf block masking is needed; only the seq_len token mask. The
    head-block of the output accumulator is selected once per sequence at
    finalize. The zero-block FLOPs are free: at M=H these matmuls are
    DMA-bound, and one [H, ...] MXU call beats KH one-row calls by ~KH.
  * Online softmax (flash running max/sum) across the page list; a
    sequence's accumulators finalize into the output when the work list
    moves to the next sequence (flat_b is sorted).
  * Numerics: score matmul runs on the native dtype with fp32 accumulation
    (bf16 x bf16 -> fp32 is exact for bf16 inputs). The p @ v matmul casts
    probabilities to the page dtype (bf16 in production: ~1e-3 relative,
    the same class as bf16 activations; fp32 tests stay bit-faithful).

Inputs:
  q          [B, H, hd]           (decode: one token per sequence)
  k_pages    [P, ps, KH*hd]       (one layer's page pool; token t of kv
                                   head h sits at [page, t % ps, h*hd:...])
  v_pages    [P, ps, KH*hd]       (same layout)
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
_VMEM_BUDGET = 8 << 20  # bytes of VMEM for the K/V DMA pipeline


def _n_slots(page_k_bytes: int, page_v_bytes: int) -> int:
    """DMA pipeline depth: deep for small pages (latency-bound), shallow for
    big ones (VMEM-bound; MHA-7B pages are 1 MB each)."""
    return max(2, min(16, _VMEM_BUDGET // (page_k_bytes + page_v_bytes)))


def _kernel(
    # scalar prefetch
    layer_ref, flat_b_ref, flat_page_ref, flat_tok0_ref, n_items_ref,
    seq_lens_ref,
    # inputs
    q_ref, kp_ref, vp_ref,
    # outputs (UNNORMALIZED flash stats — callers merge/normalize)
    o_ref, m_ref, l_ref,
    # scratch
    kbuf, vbuf, sems, *, page_size: int, n_kv_heads: int, kv_mul: int,
    max_items: int, n_slots: int,
):
    li = layer_ref[0]
    n_items = n_items_ref[0]
    B, H, hd = q_ref.shape
    ps, KH = page_size, n_kv_heads
    kv_dim = KH * hd
    scale = jax.lax.rsqrt(jnp.float32(hd))

    # static ownership mask: head h's query occupies lanes of kv head
    # h // kv_mul; everything else is EXACT ZERO (replaces block masking)
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, kv_dim), 1)
    head = jax.lax.broadcasted_iota(jnp.int32, (H, kv_dim), 0)
    own_lane = (lane // hd) == (head // kv_mul)
    tok = jax.lax.broadcasted_iota(jnp.int32, (H, ps), 1)  # in-page offset

    def dma(slot, i):
        # pools are the FULL stacked [L, P, ps, KH*hd] buffers; indexing the
        # layer here (instead of slicing before the call) avoids
        # materializing a copy of a whole layer of pages per decode step
        page = flat_page_ref[i]
        return (
            pltpu.make_async_copy(kp_ref.at[li, page], kbuf.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(vp_ref.at[li, page], vbuf.at[slot],
                                  sems.at[slot, 1]),
        )

    for w in range(n_slots - 1):
        @pl.when(w < n_items)
        def _(w=w):
            kd, vd = dma(w, w)
            kd.start()
            vd.start()

    # static fold matrix [KH*hd, hd]: sel[l, d] = (l % hd == d). With acc
    # masked to its ownership lanes, acc_m @ sel extracts each head's own
    # hd block in one MXU call (exactly one nonzero term per output —
    # Mosaic-friendly vs per-block lane slices, which need 128 alignment)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (kv_dim, hd), 0) % hd
           == jax.lax.broadcasted_iota(jnp.int32, (kv_dim, hd), 1)
           ).astype(jnp.float32)

    def finalize(b, m, l, acc):
        acc_m = jnp.where(own_lane, acc, 0.0)
        out = jax.lax.dot_general(
            acc_m, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        o_ref[b] = out.astype(o_ref.dtype)
        m_ref[b] = m[:, 0]
        l_ref[b] = l[:, 0]

    def body(i, carry):
        m, l, acc = carry  # [H, 1] x2 fp32, [H, KH*hd] fp32
        slot = jax.lax.rem(i, n_slots)
        ahead = i + n_slots - 1

        @pl.when(ahead < n_items)
        def _():
            kd, vd = dma(jax.lax.rem(ahead, n_slots), ahead)
            kd.start()
            vd.start()

        kd, vd = dma(slot, i)
        kd.wait()
        vd.wait()

        b = flat_b_ref[i]
        seq_len = seq_lens_ref[b]
        valid = flat_tok0_ref[i] + tok < seq_len  # [H, ps]

        # expand q into its ownership lanes (zeros elsewhere): [H, KH*hd].
        # Tile via lane concat (Mosaic-friendly; avoids a 3D reshape).
        q = q_ref[b]  # [H, hd] native dtype
        q_exp = jnp.where(own_lane, jnp.concatenate([q] * KH, axis=1),
                          jnp.zeros((), q.dtype))
        # bf16 x bf16 -> fp32 accumulation is exact for bf16 inputs; fp32
        # inputs (tests / fp32 caches) must request HIGHEST or the TPU
        # default runs the fp32 dot through bf16 passes (~1e-3 error)
        prec = (jax.lax.Precision.HIGHEST
                if q_ref.dtype == jnp.float32 else None)
        # contract lanes of both operands (transposed-rhs dot): [H, ps]
        s = jax.lax.dot_general(
            q_exp, kbuf[slot].astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        # p [H, ps] x v [ps, KH*hd] -> [H, KH*hd]
        pv = jax.lax.dot_general(
            p.astype(vbuf.dtype), vbuf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if vbuf.dtype == jnp.float32 else None),
        )
        acc = acc * corr + pv
        m, l = m_new, l_new

        # finalize when the NEXT item belongs to a different sequence
        is_last = jnp.logical_or(
            i + 1 >= n_items,
            flat_b_ref[jnp.minimum(i + 1, max_items - 1)] != b,
        )

        @pl.when(is_last)
        def _():
            finalize(b, m, l, acc)

        fresh = jnp.where(is_last, 0.0, 1.0)
        m = jnp.where(is_last, NEG_INF, m)
        l = l * fresh
        acc = acc * fresh
        return m, l, acc

    m0 = jnp.full((H, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H, 1), jnp.float32)
    acc0 = jnp.zeros((H, kv_dim), jnp.float32)
    jax.lax.fori_loop(0, n_items, body, (m0, l0, acc0))


def _interpret() -> bool:
    # Compiled Mosaic kernels need real TPU hardware; CPU tests use the
    # Pallas interpreter (same semantics, slow).
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


@functools.partial(jax.jit, static_argnames=("page_size", "n_kv_heads"))
def paged_attention_flat(q, k_pages, v_pages, flat_b, flat_page, flat_tok0,
                         n_items, seq_lens, page_size: int = 128,
                         n_kv_heads: int | None = None, layer_idx=None):
    """q [B, H, hd] against paged K/V via a flat work list (see
    build_work_list). k_pages/v_pages are [P, ps, KH*hd] for one layer, or
    the FULL stacked [L, P, ps, KH*hd] pools with `layer_idx` given —
    inside a lax.scan over layers ALWAYS pass the stacked pools: slicing
    the pool first materializes a copy of every page (custom-call operands
    cannot fuse a dynamic-slice).

    Returns UNNORMALIZED flash stats (acc [B, H, hd] fp32, m [B, H] fp32,
    l [B, H] fp32): out = acc / l, and partials from another source merge
    via merge_flash_parts. Rows with zero pages in the work list are NOT
    written — callers must mask on seq_lens > 0."""
    B, H, hd = q.shape
    if k_pages.ndim == 3:
        k_pages = k_pages[None]
        v_pages = v_pages[None]
        layer_idx = jnp.zeros((), jnp.int32)
    assert layer_idx is not None, "stacked pools need layer_idx"
    L, P, ps2, kv_dim = k_pages.shape
    assert ps2 == page_size, (k_pages.shape, page_size)
    assert v_pages.shape == k_pages.shape, (v_pages.shape, k_pages.shape)
    KH = n_kv_heads or kv_dim // hd
    assert KH * hd == kv_dim, (KH, hd, kv_dim)
    # compiled Mosaic DMAs need a 128-aligned minor dim; the interpreter
    # (CPU tests, tiny geometries) has no such constraint — but warn there
    # so CI surfaces geometries that can never run compiled (e.g. a pool
    # sharded over kv heads down to a 64-lane shard on hd=64 families;
    # validate_tp rejects that at setup on TPU).
    if kv_dim % 128 != 0:
        if not _interpret():
            raise AssertionError(
                f"lane dim KH*hd={kv_dim} must be 128-aligned on TPU")
        import warnings

        warnings.warn(
            f"paged attention lane dim KH*hd={kv_dim} is not 128-aligned: "
            "this geometry runs under the Pallas interpreter but can NEVER "
            "compile on TPU hardware", stacklevel=2)
    kv_mul = H // KH
    max_items = flat_b.shape[0]
    n_slots = _n_slots(ps2 * kv_dim * k_pages.dtype.itemsize,
                       ps2 * kv_dim * v_pages.dtype.itemsize)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, H, hd), lambda *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec((B, H, hd), lambda *_: (0, 0, 0)),
                   pl.BlockSpec((B, H), lambda *_: (0, 0)),
                   pl.BlockSpec((B, H), lambda *_: (0, 0))),
        scratch_shapes=[
            pltpu.VMEM((n_slots, ps2, kv_dim), k_pages.dtype),
            pltpu.VMEM((n_slots, ps2, kv_dim), v_pages.dtype),
            pltpu.SemaphoreType.DMA((n_slots, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel, page_size=page_size, n_kv_heads=KH, kv_mul=kv_mul,
        max_items=max_items, n_slots=n_slots,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
                   jax.ShapeDtypeStruct((B, H), jnp.float32),
                   jax.ShapeDtypeStruct((B, H), jnp.float32)),
        interpret=_interpret(),
    )(jnp.reshape(layer_idx, (1,)).astype(jnp.int32), flat_b, flat_page,
      flat_tok0, n_items, seq_lens, q, k_pages, v_pages)


def merge_flash_many(acc, m, l, axis: int = 0):
    """Exactly merge N unnormalized flash-attention partials over disjoint
    key sets, stacked on `axis`: acc [N, ..., hd], m/l [N, ...].
    Returns the NORMALIZED merged output [..., hd].

    This is the combine step of sequence-parallel / split-K decode
    attention (parallel/seqpar.py): each shard's kernel emits (acc, m, l)
    over its own pages; the merge is exact because softmax renormalization
    factors exp(m_i - max m) commute with the weighted sums."""
    m_max = jnp.max(m, axis=axis)
    c = jnp.exp(m - jnp.expand_dims(m_max, axis))
    num = jnp.sum(acc * c[..., None], axis=axis)
    den = jnp.sum(l * c, axis=axis)
    return num / jnp.maximum(den[..., None], 1e-30)


def merge_flash_parts(acc1, m1, l1, acc2, m2, l2):
    """Two-partial convenience form of merge_flash_many."""
    return merge_flash_many(jnp.stack([acc1, acc2]), jnp.stack([m1, m2]),
                            jnp.stack([l1, l2]))


def paged_attention(q, k_pages, v_pages, page_table, seq_lens,
                    page_size: int = 128):
    """Convenience wrapper building the work list on host from numpy
    page_table/seq_lens (jax arrays are pulled to host — prefer
    paged_attention_flat inside jitted steps). Returns the NORMALIZED
    output [B, H, hd] in q.dtype."""
    import numpy as np

    pt = np.asarray(page_table)
    sl = np.asarray(seq_lens)
    fb, fp, ft, n = build_work_list(pt, sl, page_size)
    acc, m, l = paged_attention_flat(
        q, k_pages, v_pages, jnp.asarray(fb), jnp.asarray(fp),
        jnp.asarray(ft), jnp.asarray(n), jnp.asarray(sl),
        page_size=page_size,
    )
    return (acc / jnp.maximum(l[..., None], 1e-30)).astype(q.dtype)

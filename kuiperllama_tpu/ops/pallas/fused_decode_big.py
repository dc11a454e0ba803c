"""Decode megakernel for BIG models (Llama-2-7B / Llama-3-8B class).

The r4 megakernel (fused_decode.py) keeps a layer's whole attention weight
set VMEM-resident and tiles only the FFN — at 7B that is 67 MB of qkv+wo
per layer, twice over for the double buffer, far past VMEM. This kernel
tiles EVERY projection, so the per-iteration working set is one ~3-8 MB
weight tile regardless of model size:

  grid (L, NP) with NP = NQ + NO + NT phases per layer:
    p in [0, NQ)        — qkv column tile p: y_p = gemv(h1, wqkv[:, p])
                          accumulated into a [NQ, 1, TQ] VMEM scratch
                          (dim-0 dynamic store; Mosaic allows those)
    p == NQ             — attention: assemble y (static row reads +
                          lane concat), rope, scores vs the cache slabs,
                          analytic new-token merge (no aliased cache
                          write — same rules as fused_decode.py), then
                          split attn_flat into [NO, 1, TR] row parts
    p in [NQ, NQ+NO)    — wo ROW tile j: o += gemv(attn_part[j], wo[j])
    p in [NQ+NO, NP)    — FFN column tile t (gate/up cols + w2 rows),
                          identical to the small kernel's FFN tiling
  Residual adds happen at the phase-group boundaries; the layer loop is
  the leading grid dim exactly as in the small kernel.

GEMVs default to the r5 int8-activation path (_quant_act/_gemv_from_act):
the activation row quantizes per weight-group to int8 once per layer into
a VMEM scratch, every projection runs ONE s8xs8->s32 MXU pass (half the
MXU cycles of bf16, zero dequant-cast VPU work), and the combined
(weight-group x activation-group) scales apply to the s32 partials in
fp32. Measured on this chip (tools/exp_int8.py): an [L, 4096, 2048] int8
tile stream through this formulation runs at 789 GB/s — 96% of the
819 GB/s spec — vs 766 for the bf16-cast recipe.

Prefetch staggering: at a layer boundary ~24 MB of next-layer blocks
would otherwise all be due in one iteration (qkv tile 0, wo tile 0, both
cache slabs, FFN tile 0). The index maps switch the idle operands to the
next layer's block early — slabs right after the attention phase, wo and
qkv at spaced points inside the FFN phase run — so each big fetch gets
its own iteration-sized window.

Replaces (functionally) the reference's per-token big-model path
(kuiper/source/model/llama3.cpp:600-731, one CUDA launch per op) with a
single launch per decode step at sizes the r4 kernel could not hold.

Scope: B=1 decode, dense cache slab <= ~4 MB/layer (the bench's bucketed
active window), quantized weights only (a bf16-dense 7B does not fit the
chip anyway). Small models keep fused_decode.py's kernel.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant import QuantArray
from .fused_decode import (NEG_INF, _VMEM_LIMIT, _gemv, _gemv_from_act,
                           _heads_to_flat, _flat_to_heads, _interpret,
                           _iota2, _quant_act, _rmsnorm, _rows, rope_matrix)

# int8-activation GEMVs in this kernel (KT_BIG_INT8=0 restores the bf16
# block-diagonal recipe for A/B). Process-start-only like every KT_* knob.
_BIG_INT8 = _os.environ.get("KT_BIG_INT8", "1") == "1"
# measurement-only ablations (tools/exp_big.py): comma-set of
# {attn, stage, qkv, wo, ffn} — replaces that phase's COMPUTE with a
# near-no-op while keeping every DMA identical, so the delta vs baseline
# is that phase's serialized (non-overlapped) cost. Never set in
# production (outputs are garbage).
_ABLATE = frozenset(
    x for x in _os.environ.get("KT_BIG_ABLATE", "").split(",") if x)

# per-weight-tile byte budget: one ~8 MB block per phase streams at
# 766-789 GB/s (tools/exp_int8.py, r5); much smaller tiles waste
# iteration overhead, much bigger ones lengthen the pipeline's stall
# quantum and the double-buffer footprint. KT_BIG_TILE overrides for
# sweeps (process-start-only, like every KT_* knob).
_TILE_BUDGET = int(_os.environ.get("KT_BIG_TILE", str(9 * (1 << 20))))


def _pick_div(dim: int, quantum: int, cap_bytes: int, row_bytes: int):
    """Largest multiple-of-`quantum` divisor of dim with
    tile_cols * row_bytes <= cap_bytes; None if nothing divides."""
    best = None
    for k in range(1, dim // quantum + 1):
        t = k * quantum
        if dim % t == 0 and t * row_bytes <= cap_bytes:
            best = t
    return best


def plan_big(blocks, cache_dtype=jnp.bfloat16, active_len: int = 1024):
    """Tiling plan for the big-model megakernel, or None when the model
    cannot take it (dense weights, non-dividing dims, or VMEM overflow).
    Returns dict(TQ, NQ, TR, NO, ht, NT)."""
    if "wqkv" not in blocks or "w13" not in blocks:
        return None
    wqkv, wo, w13, w2 = (blocks.get("wqkv"), blocks.get("wo"),
                         blocks.get("w13"), blocks.get("w2"))
    if not isinstance(wqkv, QuantArray):
        return None  # bf16-dense big models don't fit the chip anyway
    g = wqkv.group_size
    L, d, QCOLS = wqkv.q.shape
    hidden = w2.q.shape[-2]
    if d % g or hidden % g or QCOLS % 128 or d % 128:
        return None
    ngd = d // g
    # scale rows must match between the A scratch and every scales block
    if wqkv.s.shape[1] != ngd or w13.s.shape[1] != ngd \
            or wo.s.shape[1] != ngd:
        return None
    sdt = wqkv.s.dtype.itemsize
    # qkv column tiles (int8 rows: d bytes per output col)
    TQ = _pick_div(QCOLS, 128, _TILE_BUDGET, d)
    # wo row tiles: TR * d int8 bytes; TR must be group- and
    # scale-row-block aligned (TR/g rows, sublane quantum 16 for bf16
    # scales / 8 for fp32)
    squant = (16 if sdt == 2 else 8) * g
    TR = _pick_div(d, squant, _TILE_BUDGET, d)
    # FFN column tiles: gate + up (d*ht each) + w2 (ht*d) int8
    ht = _pick_div(hidden, max(128, g), _TILE_BUDGET, 3 * d)
    if TQ is None or TR is None or ht is None:
        return None
    if (hidden // ht) > 64:
        return None  # degenerate tiling; keep the layered path
    NQ, NO, NT = QCOLS // TQ, d // TR, hidden // ht
    kv_lane = d  # slab lane dim KH*hd <= d; bound with d for the estimate
    slab = active_len * kv_lane * jnp.dtype(cache_dtype).itemsize
    est = 2 * (TQ * d + TQ * ngd * sdt        # qkv tile + scales
               + TR * d + (TR // g) * d * sdt  # wo tile + scales
               + 2 * d * ht + 2 * ngd * ht * sdt  # gate+up tiles
               + ht * d + 8 * d * 4           # w2 tile + scales
               + 2 * slab)                    # k + v slabs
    est += (NQ * TQ + 2 * d) * 4 + 2 * ngd * d  # scratches (one-buffered)
    if est > int(_VMEM_LIMIT * 0.82):
        return None
    return dict(TQ=TQ, NQ=NQ, TR=TR, NO=NO, ht=ht, NT=NT)


def fits_vmem_big(blocks, cache_dtype=jnp.bfloat16,
                  active_len: int = 1024) -> bool:
    return plan_big(blocks, cache_dtype, active_len) is not None


def _kernel(pos_ref,
            x0_ref, R_ref, attn_norm_ref, ffn_norm_ref, final_norm_ref,
            wqkv_ref, wqkv_s_ref, wo_ref, wo_s_ref,
            w13g_ref, w13g_s_ref, w13u_ref, w13u_s_ref,
            w2_ref, w2_s_ref, bqkv_ref,
            k_in_ref, v_in_ref,
            x_out_ref, k_new_ref, v_new_ref,
            x_acc, h_buf, a_buf, ad_buf, qkv_parts, attn_parts, o_acc,
            ffn_acc,
            *, H, KH, hd, g, eps, n_layers, NQ, NO, NT, has_bias, int8_a):
    l = pl.program_id(0)
    p = pl.program_id(1)
    pos = pos_ref[0]
    d = H * hd
    KV = KH * hd
    kv_mul = H // KH
    A = k_in_ref.shape[1]
    TQ = wqkv_ref.shape[2]
    TR = wo_ref.shape[1]
    ngp = a_buf.shape[0]

    def proj(ref, s_ref, lead=(0,)):
        """GEMV of the layer's normed activation (pre-staged in a_buf /
        h_buf) against one weight tile."""
        if int8_a:
            return _gemv_from_act(a_buf[:], ad_buf[:, :1], ref, s_ref, lead)
        return _gemv(h_buf[:], ref, s_ref, g, lead, int8_a=False)

    def stage_act(h_bf):
        """Stage a normed activation row for the following tile phases."""
        if "stage" in _ABLATE:  # measurement-only: skip norm+quant cost
            if int8_a:
                a_buf[:] = jnp.zeros(a_buf.shape, a_buf.dtype)
                ad_buf[:] = jnp.ones(ad_buf.shape, ad_buf.dtype)
            else:
                h_buf[:] = jnp.zeros(h_buf.shape, h_buf.dtype)
            return
        if int8_a:
            Aq, dv = _quant_act(h_bf, ngp, d, g)
            a_buf[:] = Aq
            ad_buf[:] = jnp.broadcast_to(dv, ad_buf.shape)
        else:
            h_buf[:] = h_bf

    # ---- layer bring-up + qkv tiles ----
    @pl.when(p == 0)
    def _():
        @pl.when(l == 0)
        def _():
            x_acc[:] = x0_ref[:].astype(jnp.float32)

        x = x_acc[:]
        stage_act(_rmsnorm(x, attn_norm_ref[0], eps))

    @pl.when(p < NQ)
    def _():
        y = proj(wqkv_ref, wqkv_s_ref)  # [1, TQ] fp32
        if has_bias:
            y = y + bqkv_ref[0].astype(jnp.float32)
        qkv_parts[pl.ds(p, 1)] = y[None]

    # ---- attention (first wo phase) ----
    @pl.when(p == NQ)
    def _():
        if "attn" in _ABLATE:  # measurement-only: attention bubble cost
            dep = jnp.sum(qkv_parts[0][:, :128]) * 1e-9  # keep qkv live
            z = (jnp.zeros((1, TR), jnp.float32) + dep).astype(jnp.bfloat16)
            for j in range(NO):
                attn_parts[j] = z
            k_new_ref[0] = jnp.zeros(k_new_ref.shape[1:], k_new_ref.dtype)
            v_new_ref[0] = jnp.zeros(v_new_ref.shape[1:], v_new_ref.dtype)
            o_acc[:] = jnp.zeros_like(o_acc)
            return
        y = jnp.concatenate([qkv_parts[i] for i in range(NQ)], axis=1)
        y = y.astype(jnp.bfloat16)  # projections round to activation dtype
        q = _flat_to_heads(y[:, : H * hd], H, hd)
        k = _flat_to_heads(y[:, H * hd: (H + KH) * hd], KH, hd)
        v = _flat_to_heads(y[:, (H + KH) * hd:], KH, hd)

        R = R_ref[:]
        q = jax.lax.dot_general(q, R, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        k = jax.lax.dot_general(k, R, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        q = q.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)

        k_flat = _heads_to_flat(k.astype(jnp.float32), KH, hd, jnp.bfloat16)
        v_flat = _heads_to_flat(v, KH, hd, jnp.bfloat16)
        k_new_ref[0] = k_flat.astype(k_new_ref.dtype)
        v_new_ref[0] = v_flat.astype(v_new_ref.dtype)
        kslab = k_in_ref[0]
        vslab = v_in_ref[0]

        own = (_iota2((H, KV), 1) // hd == _iota2((H, KV), 0) // kv_mul)
        own_f = own.astype(jnp.float32)
        q_exp = jnp.where(own, jnp.concatenate([q] * KH, axis=1),
                          jnp.zeros((), jnp.bfloat16))
        prec = (jax.lax.Precision.HIGHEST
                if kslab.dtype == jnp.float32 else None)
        scale = jax.lax.rsqrt(jnp.float32(hd))
        scores = jax.lax.dot_general(
            q_exp.astype(kslab.dtype), kslab, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale  # [H, A]
        valid = _iota2((H, A), 1) < pos
        scores = jnp.where(valid, scores, NEG_INF)
        s_new = jnp.sum(
            (q_exp.astype(jnp.float32)
             * (own_f * _rows(k_flat.astype(jnp.float32), H))), axis=-1,
            keepdims=True) * scale
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_new)
        pr = jnp.exp(scores - m)
        p_new = jnp.exp(s_new - m)
        denom = jnp.sum(pr, axis=-1, keepdims=True) + p_new
        pv = jax.lax.dot_general(
            pr.astype(vslab.dtype), vslab, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        pv = pv + p_new * (own_f * _rows(v_flat.astype(jnp.float32), H))
        pv = pv / denom
        sel = (_iota2((KV, hd), 0) % hd == _iota2((KV, hd), 1)
               ).astype(jnp.float32)
        attn = jax.lax.dot_general(
            jnp.where(own, pv, 0.0), sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [H, hd]
        attn_flat = _heads_to_flat(attn.astype(jnp.bfloat16), H, hd,
                                   jnp.bfloat16)
        for j in range(NO):
            attn_parts[j] = attn_flat[:, j * TR:(j + 1) * TR]
        o_acc[:] = jnp.zeros_like(o_acc)

    # ---- wo row tiles ----
    @pl.when((p >= NQ) & (p < NQ + NO))
    def _():
        j = p - NQ
        ap = attn_parts[pl.ds(j, 1)][0]  # [1, TR] bf16
        ngo = TR // g
        if int8_a:
            Aq, dv = _quant_act(ap, ngo, TR, g)
            part = _gemv_from_act(Aq, dv, wo_ref, wo_s_ref, (0,))
        else:
            part = _gemv(ap, wo_ref, wo_s_ref, g, (0,), int8_a=False)
        o_acc[:] += part

        @pl.when(p == NQ + NO - 1)
        def _():
            x = (x_acc[:] + o_acc[:]).astype(jnp.bfloat16
                                             ).astype(jnp.float32)
            x_acc[:] = x
            stage_act(_rmsnorm(x, ffn_norm_ref[0], eps))
            ffn_acc[:] = jnp.zeros_like(ffn_acc)

    # ---- FFN column tiles ----
    @pl.when(p >= NQ + NO)
    def _():
        t = p - NQ - NO
        gate = proj(w13g_ref, w13g_s_ref).astype(jnp.bfloat16)  # [1, ht]
        up = proj(w13u_ref, w13u_s_ref).astype(jnp.bfloat16)
        gf = gate.astype(jnp.float32)
        act = ((gf * jax.nn.sigmoid(gf)).astype(jnp.bfloat16) * up)
        ht = act.shape[-1]
        ngt_p = w2_s_ref.shape[2]
        if int8_a:
            Aq, dv = _quant_act(act, ngt_p, ht, g)
            part = _gemv_from_act(Aq, dv, w2_ref, w2_s_ref, (0, 0))
        else:
            part = _gemv(act, w2_ref, w2_s_ref, g, (0, 0), int8_a=False)
        ffn_acc[:] += part

        @pl.when(t == NT - 1)
        def _():
            x = (x_acc[:] + ffn_acc[:]).astype(jnp.bfloat16
                                               ).astype(jnp.float32)
            x_acc[:] = x

            @pl.when(l == n_layers - 1)
            def _():
                xo = _rmsnorm(x, final_norm_ref[0], eps)
                x_out_ref[:] = xo.astype(x_out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("H", "KH", "hd", "g", "eps", "rope_style",
                     "TQ", "NQ", "TR", "NO", "ht", "NT", "int8_a"),
)
def _fused_step_big(x0, k_cache, v_cache, pos, sin_row, cos_row, params,
                    H, KH, hd, g, eps, rope_style, TQ, NQ, TR, NO, ht, NT,
                    int8_a):
    blocks = params["blocks"]
    L, A, KV = k_cache.shape
    d = H * hd
    R = rope_matrix(sin_row, cos_row, rope_style, hd)

    wqkv, wo, w13, w2 = (blocks["wqkv"], blocks["wo"], blocks["w13"],
                         blocks["w2"])
    QCOLS = wqkv.q.shape[-1]
    hidden = w2.q.shape[-2]
    ngd = d // g
    ngt = ht // g
    ngt_p = -(-ngt // 8) * 8
    # w2 per-tile blocks [L, NT, ht, d] (+ regrouped, row-padded scales) —
    # scan-invariant, hoisted out of the decode scan by XLA
    w2q4 = w2.q.reshape(L, NT, ht, d)
    s2 = w2.s[:, :hidden // g].reshape(L, NT, ngt, d)
    if ngt_p != ngt:
        s2 = jnp.pad(s2, ((0, 0), (0, 0), (0, ngt_p - ngt), (0, 0)))

    has_bias = "bqkv" in blocks
    bqkv = (blocks["bqkv"] if has_bias
            else jnp.zeros((L, max(TQ, 128)), jnp.bfloat16))
    if bqkv.ndim == 2:
        # [L, 1, W]: 3-D so the block's sublane dim is the full (size-1)
        # axis — a 2-D (1, TQ) block violates Mosaic's 8-sublane rule
        bqkv = bqkv[:, None]

    NP = NQ + NO + NT
    # staggered next-layer prefetch points (index maps switch the idle
    # operand to (l+1, block 0) so the big fetches don't pile up at the
    # layer boundary); all guarded to stay inside the FFN phase range
    if _os.environ.get("KT_BIG_STAGGER", "1") == "1":
        SW_SLAB = NQ + 1
        SW_WO = NQ + NO + max(1, NT // 3)
        SW_QKV = NQ + NO + max(2, (2 * NT) // 3)
    else:  # A/B: everything refetches at the layer boundary
        SW_SLAB = SW_WO = SW_QKV = NP + 1

    def lnext(l):
        return jnp.minimum(l + 1, L - 1)

    def qcol(p):
        return jnp.minimum(p, NQ - 1)

    def qkv_im(l, p, _):
        sw = p >= SW_QKV
        return (jnp.where(sw, lnext(l), l), 0, jnp.where(sw, 0, qcol(p)))

    def qkv_s_im(l, p, _):
        if "scales" in _ABLATE:
            return (0, 0, 0)
        sw = p >= SW_QKV
        return (jnp.where(sw, lnext(l), l), 0, jnp.where(sw, 0, qcol(p)))

    def bq_im(l, p, _):
        sw = p >= SW_QKV
        return (jnp.where(sw, lnext(l), l), 0, jnp.where(sw, 0, qcol(p)))

    def rb(p):
        return jnp.clip(p - NQ, 0, NO - 1)

    def wo_im(l, p, _):
        sw = p >= SW_WO
        return (jnp.where(sw, lnext(l), l), jnp.where(sw, 0, rb(p)), 0)

    def wo_s_im(l, p, _):
        if "scales" in _ABLATE:
            return (0, 0, 0)
        sw = p >= SW_WO
        return (jnp.where(sw, lnext(l), l), jnp.where(sw, 0, rb(p)), 0)

    def slab_im(l, p, _):
        return (jnp.where(p >= SW_SLAB, lnext(l), l), 0, 0)

    def ft(p):
        return jnp.clip(p - NQ - NO, 0, NT - 1)

    def w13_im(off):
        def im(l, p, _, off=off):
            return (l, 0, off + ft(p))
        return im

    s13_cols = w13.s.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NP),
        in_specs=[
            pl.BlockSpec((1, d), lambda l, p, _: (0, 0)),          # x0
            pl.BlockSpec((hd, hd), lambda l, p, _: (0, 0)),        # R
            pl.BlockSpec((1, 1, d), lambda l, p, _: (l, 0, 0)),    # attn_norm
            pl.BlockSpec((1, 1, d), lambda l, p, _: (l, 0, 0)),    # ffn_norm
            pl.BlockSpec((1, 1, d), lambda l, p, _: (0, 0, 0)),    # final
            pl.BlockSpec((1, d, TQ), qkv_im),                      # wqkv
            pl.BlockSpec((1, ngd, TQ), qkv_s_im),                  # wqkv_s
            pl.BlockSpec((1, TR, d), wo_im),                       # wo
            pl.BlockSpec((1, TR // g, d), wo_s_im),                # wo_s
            pl.BlockSpec((1, d, ht), w13_im(0)),                   # gate
            pl.BlockSpec((1, ngd, ht), (lambda l, p, _: (0, 0, 0))
                         if "scales" in _ABLATE else w13_im(0)),   # gate_s
            pl.BlockSpec((1, d, ht), w13_im(NT)),                  # up
            pl.BlockSpec((1, ngd, ht), (lambda l, p, _: (0, 0, 0))
                         if "scales" in _ABLATE else w13_im(NT)),  # up_s
            pl.BlockSpec((1, 1, ht, d),
                         lambda l, p, _: (l, ft(p), 0, 0)),        # w2
            pl.BlockSpec((1, 1, ngt_p, d),
                         (lambda l, p, _: (0, 0, 0, 0))
                         if "scales" in _ABLATE
                         else (lambda l, p, _: (l, ft(p), 0, 0))),  # w2_s
            pl.BlockSpec((1, 1, TQ) if has_bias
                         else (1, 1, bqkv.shape[-1]),
                         bq_im if has_bias
                         else (lambda l, p, _: (0, 0, 0))),        # bqkv
            pl.BlockSpec((1, A, KV), slab_im),                     # k_in
            pl.BlockSpec((1, A, KV), slab_im),                     # v_in
        ],
        out_specs=[
            pl.BlockSpec((1, d), lambda l, p, _: (0, 0)),          # x_out
            pl.BlockSpec((1, 1, KV), lambda l, p, _: (l, 0, 0)),   # k_new
            pl.BlockSpec((1, 1, KV), lambda l, p, _: (l, 0, 0)),   # v_new
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),                 # x_acc
            pltpu.VMEM((1, d), jnp.bfloat16),                # h_buf
            pltpu.VMEM((ngd, d), jnp.int8 if int8_a
                       else jnp.bfloat16),                   # a_buf
            pltpu.VMEM((ngd, 128), jnp.float32),             # ad_buf
            pltpu.VMEM((NQ, 1, TQ), jnp.float32),            # qkv_parts
            pltpu.VMEM((NO, 1, TR), jnp.bfloat16),           # attn_parts
            pltpu.VMEM((1, d), jnp.float32),                 # o_acc
            pltpu.VMEM((1, d), jnp.float32),                 # ffn_acc
        ],
    )
    kernel = functools.partial(
        _kernel, H=H, KH=KH, hd=hd, g=g, eps=eps, n_layers=L,
        NQ=NQ, NO=NO, NT=NT, has_bias=has_bias, int8_a=int8_a)
    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((1, d), x0.dtype),
                   jax.ShapeDtypeStruct((L, 1, KV), k_cache.dtype),
                   jax.ShapeDtypeStruct((L, 1, KV), v_cache.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.reshape(pos, (1,)).astype(jnp.int32),
      x0, R,
      params["blocks"]["attn_norm"][:, None].astype(jnp.float32),
      params["blocks"]["ffn_norm"][:, None].astype(jnp.float32),
      jnp.reshape(params["final_norm"], (1, 1, d)).astype(jnp.float32),
      wqkv.q, wqkv.s, wo.q, wo.s,
      w13.q, w13.s, w13.q, w13.s,  # gate/up: same arrays, offset blocks
      w2q4, s2,
      bqkv,
      k_cache, v_cache)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new, (0, pos.astype(jnp.int32), 0))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new, (0, pos.astype(jnp.int32), 0))
    return x_out, k_cache, v_cache


def fused_decode_step_big(cfg, params, x0, k_cache, v_cache, pos, sin, cos,
                          int8_a: bool | None = None):
    """One full decode-layer-stack forward for B=1 at big-model geometry.
    Same contract as fused_decode.fused_decode_step."""
    blocks = params["blocks"]
    plan = plan_big(blocks, k_cache.dtype, k_cache.shape[1])
    assert plan is not None, "model does not fit the big-megakernel plan"
    g = blocks["wqkv"].group_size
    p = jnp.minimum(pos, cfg.seq_len - 1)
    return _fused_step_big(
        x0, k_cache, v_cache, pos, sin[p], cos[p], params,
        H=cfg.n_heads, KH=cfg.n_kv_heads, hd=cfg.head_dim, g=g,
        eps=cfg.norm_eps, rope_style=cfg.rope_style,
        int8_a=_BIG_INT8 if int8_a is None else int8_a, **plan)

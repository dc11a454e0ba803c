"""Single-kernel decode step (decode megakernel) for B=1 small models.

Why: a decode step through the layered path launches ~10 kernels per layer
(norm fusions, 4 projection pallas_calls, rope, cache scatter, attention
einsums) — ~200 launches/step. At 7B the weight stream (6.8 GB) dwarfs the
launch cost, but at TinyLlama scale (1.07 GB, ~1.3 ms of stream) the fixed
per-launch ramp is ~45% of the step (r4 ablation, tools/exp_step.py:
matmuls-in-isolation 1.0 ms vs 2.36 ms end-to-end). The TPU-native answer
is ONE pallas_call per decode step: the layer loop becomes the GRID, every
per-layer weight is a blocked operand whose index_map walks the stacked
[L, ...] arrays, and Mosaic's pipeline double-buffers layer l+1's weights
during layer l's compute — the same continuous HBM stream the isolated
fori_loop microbenchmark sustains.

In-kernel building blocks (all proven in ops/pallas/paged_attention.py's
compiled kernel or probed on hardware):
  * RMSNorm: lane reductions on [1, d] fp32.
  * GEMV: the block-diagonal group-dequant trick from quant_matmul.py —
    A = blockdiag(x) [ng, K] built by iota-mask multiply, P = A @ W_int8
    one MXU call, scales applied to the [ng, N] partials (fp32).
  * RoPE: a [hd, hd] rotation matrix built OUTSIDE per position (both
    pairing styles — rope_matrix()); q/k rotate with one tiny MXU dot.
    Mosaic rejects flat->2D reshapes ("unsupported shape cast"), so
    [1, H*hd] <-> [H, hd] conversions use mask+fold matmuls instead.
  * Attention: dense-cache GQA exactly like the paged kernel's lane-
    ownership layout (q_exp [H, KH*hd], scores [H, S] fp32 softmax,
    ownership-masked pv fold).
  * Cache append: the kernel only READS the k/v slabs; the new token's
    K/V leave as [L, 1, KV] outputs (one XLA dynamic_update_slice installs
    them after the call) and their attention contribution is merged
    analytically into the softmax — an in-kernel aliased slab write
    created a RAW hazard that blocked cross-layer DMA pipelining.
  * FFN tiling: grid (L, NT) — attention runs in tile-0's iteration, FFN
    column-tile t (gate/up columns + matching w2 rows) in iteration t, so
    only attention weights + ONE FFN tile pair are VMEM-resident
    (plan_tiles picks NT; TinyLlama NT=2, Llama-3.2-1B NT=4).

Replaces (functionally) the per-token path of the reference
kuiper/source/model/llama3.cpp:600-731 — which launches 10+ CUDA kernels
per layer per token — with one launch per step.

Scope: B=1 decode, dense cache, fused weights (wqkv/w13), quantized
(QuantArray) or bf16 dense, optional qkv bias, any rope style. Models must
fit the VMEM budget (fits_vmem()): roughly per-layer weight bytes x2 (the
double buffer) + slabs <= ~100 MB — true for TinyLlama-1.1B/Llama-3.2-1B
INT8 and Qwen2.5-0.5B bf16; Llama-2-7B takes the layered path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant import QuantArray

import os as _os

NEG_INF = -1e30
_VMEM_LIMIT = 116 * 1024 * 1024
# process-start-only sweep knob: hand int8 sub-chunks to dot_general
# without the explicit bf16 cast (Mosaic converts internally). r4 A/B at
# TinyLlama: 518.5 vs 514.8 tok/s — noise-level; default off.
_MIXED_DOT = _os.environ.get("KT_MIXED_DOT") == "1"
# int8-activation GEMVs in the SMALL megakernel (quantize the normed
# activation per group, s8xs8->s32 MXU pass, no dequant cast — see
# _quant_act/_gemv_from_act). Default is the SHAPE-KEYED rule in
# ops/tuning.py (int8 at >= 32 group rows, measured crossover at
# TinyLlama); KT_GEMV_INT8=0/1 overrides.


def rope_matrix(sin_row, cos_row, style: str, hd: int):
    """[hd, hd] fp32 rotation R with y = x @ R == ops.rope.apply_rope(x)
    for a single position (sin_row/cos_row: [hd//2] fp32).

    Exactness: every output element is a sum of exactly two products —
    the same two products apply_rope forms — so the fp32 dot (HIGHEST)
    matches apply_rope's fp32 arithmetic bit-for-bit."""
    h2 = hd // 2
    i = jnp.arange(hd)
    R = jnp.zeros((hd, hd), jnp.float32)
    if style == "half":
        cfull = jnp.concatenate([cos_row, cos_row])
        R = R.at[i, i].set(cfull)
        j = jnp.arange(h2)
        R = R.at[j + h2, j].set(-sin_row)
        R = R.at[j, j + h2].set(sin_row)
    else:  # interleaved (llama2.c adjacent pairs)
        j = jnp.arange(h2)
        R = R.at[2 * j, 2 * j].set(cos_row)
        R = R.at[2 * j + 1, 2 * j + 1].set(cos_row)
        R = R.at[2 * j + 1, 2 * j].set(-sin_row)
        R = R.at[2 * j, 2 * j + 1].set(sin_row)
    return R


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _rows(y, n: int):
    """[1, X] -> [n, X] via concat: Mosaic's vector.broadcast fails the
    relayout for small row counts (e.g. (1,128)->(2,128) at qwen's KH=2);
    an explicit concat always lowers."""
    return jnp.concatenate([y] * n, axis=0) if n > 1 else y


_SUB_BUDGET = int(_os.environ.get("KT_SUB_BUDGET", str(6 * 1024 * 1024)))


def _sub(K: int, N: int, budget: int = 0) -> int:
    """Reduction sub-chunk: largest 128-multiple divisor of K whose bf16
    dequant transient (sub x N x 2 bytes) fits `budget` (default
    KT_SUB_BUDGET, 6 MB); K when nothing divides (tiny test shapes take
    one chunk)."""
    budget = budget or _SUB_BUDGET
    best = None
    for c in range(128, K + 1, 128):
        if K % c:
            continue
        if c * N * 2 <= budget:
            best = c
        else:
            break
    return best or K


def _quant_act(h_bf, ngp: int, K: int, g: int):
    """Per-GROUP int8 quantization of an activation row: returns
    (Aq int8 [ngp, K] block-diagonal, d fp32 [ngp, 1] per-group scales).
    Rounding error ~0.4% relative per element — the same class as the
    bf16 rounding the bf16-A path pays on h itself."""
    mask = (_iota2((ngp, K), 0) == _iota2((ngp, K), 1) // g)
    Af = mask.astype(jnp.float32) * _rows(h_bf.astype(jnp.float32), ngp)
    amax = jnp.max(jnp.abs(Af), axis=1, keepdims=True)  # [ngp, 1]
    d = jnp.where(amax > 0, amax / 127.0, 1.0)
    Aq = jnp.round(Af / d).astype(jnp.int8)
    return Aq, d


def _gemv_from_act(Aq, d, w_ref, s_ref, lead):
    """Block-diagonal GEMV from a PRE-QUANTIZED activation (see _quant_act):
    one s8 x s8 -> s32 MXU pass (2x bf16 MXU throughput, zero dequant-cast
    VPU work), scales (weight-group x activation-group) applied to the
    [ngp, N] s32 partials in fp32."""
    full = (slice(None), slice(None))
    Pi = jax.lax.dot_general(
        Aq, w_ref[(*lead, *full)], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # [ngp, N] exact
    y = jnp.sum(Pi.astype(jnp.float32) * d
                * s_ref[(*lead, *full)].astype(jnp.float32),
                axis=0, keepdims=True)
    return y  # [1, N] fp32


def _gemv(h_bf, w_ref, s_ref, g: int, lead=(0,), int8_a=None):
    """[1, K] bf16 @ (int8 [*lead, K, N] + scales [*lead, ngp, N]) ->
    [1, N] fp32 via the block-diagonal group-partial trick; or a plain dot
    when s_ref is None (dense bf16 weight). `lead` indexes away the
    leading block dims of the ref (e.g. (0, 0) for a [1, 1, K, N] tile).

    int8_a=False (bf16 A): the int8 tile is dequantized (cast) and
    contracted per reduction SUB-chunk — one whole-weight cast is a 2x
    VMEM transient (23 MB for w13) that both breaks the pipeline's
    double-buffer budget and serializes ~25 us of VPU behind the MXU;
    chunking lets Mosaic overlap chunk i+1's cast with chunk i's MXU pass
    (the same rule quant_matmul.py's fast mode learned in r3).

    int8_a=True: quantize the activation per group (_quant_act) and run
    ONE s8xs8->s32 MXU pass — no weight cast at all, half the MXU cycles
    (r5; the in-kernel dots at ng = K/g <= 64 rows run at <= half MXU row
    utilization, so their cycle cost is what fails to hide behind DMA)."""
    full = (slice(None), slice(None))
    if s_ref is None:
        return jax.lax.dot_general(
            h_bf, w_ref[(*lead, *full)], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    nl = len(lead)
    K = w_ref.shape[nl]
    ngp = s_ref.shape[nl]  # padded group rows; rows >= K//g stay zero in A
    if int8_a is None:
        from ..tuning import gemv_int8_auto

        int8_a = gemv_int8_auto(ngp)
    if int8_a:
        Aq, d = _quant_act(h_bf, ngp, K, g)
        return _gemv_from_act(Aq, d, w_ref, s_ref, lead)
    A = (_iota2((ngp, K), 0) == _iota2((ngp, K), 1) // g
         ).astype(jnp.bfloat16) * _rows(h_bf, ngp)
    sub = _sub(K, w_ref.shape[nl + 1])
    P = None
    for i in range(K // sub):
        wc = w_ref[(*lead, slice(i * sub, (i + 1) * sub), slice(None))]
        if not _MIXED_DOT:
            wc = wc.astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            A[:, i * sub:(i + 1) * sub], wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [ngp, N]
        P = part if P is None else P + part
    y = jnp.sum(P * s_ref[(*lead, *full)].astype(jnp.float32), axis=0,
                keepdims=True)
    return y  # [1, N] fp32


def _rmsnorm(x_f32, w_row, eps: float):
    """[1, d] fp32 (+ weight row [1, d]) -> [1, d] bf16 (matches
    ops.rmsnorm: fp32 accum, then the activation-dtype rounding)."""
    ms = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    n = x_f32 * jax.lax.rsqrt(ms + eps)
    return (n * w_row.astype(jnp.float32)).astype(jnp.bfloat16)


def _flat_to_heads(y_slice, n_heads: int, hd: int):
    """[1, n_heads*hd] -> [n_heads, hd] via mask+fold matmul (Mosaic has no
    flat->2D reshape)."""
    D = n_heads * hd
    own = (_iota2((n_heads, D), 1) // hd == _iota2((n_heads, D), 0)
           ).astype(jnp.bfloat16)
    sel = (_iota2((D, hd), 0) % hd == _iota2((D, hd), 1)).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        own * _rows(y_slice.astype(jnp.bfloat16), n_heads), sel,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [n_heads, hd] fp32


def _heads_to_flat(x_hd, n_heads: int, hd: int, out_dtype):
    """[n_heads, hd] -> [1, n_heads*hd] (inverse mask+fold)."""
    D = n_heads * hd
    own = (_iota2((n_heads, D), 1) // hd == _iota2((n_heads, D), 0)
           ).astype(jnp.float32)
    exp = own * jnp.concatenate([x_hd] * n_heads, axis=1)  # [n_heads, D]
    flat = jax.lax.dot_general(
        jnp.ones((1, n_heads), jnp.float32), exp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return flat.astype(out_dtype)


def _kernel(pos_ref,  # scalar prefetch
            x0_ref, R_ref, attn_norm_ref, ffn_norm_ref, final_norm_ref,
            wqkv_ref, wqkv_s_ref, wo_ref, wo_s_ref,
            w13g_ref, w13g_s_ref, w13u_ref, w13u_s_ref,
            w2_ref, w2_s_ref, bqkv_ref,
            k_in_ref, v_in_ref,
            x_out_ref, k_new_ref, v_new_ref,
            x_acc, h2_buf, ffn_acc,
            *, H, KH, hd, g, eps, n_layers, n_tiles, quant, has_bias):
    l = pl.program_id(0)
    t = pl.program_id(1)
    pos = pos_ref[0]
    d = H * hd
    KV = KH * hd
    kv_mul = H // KH
    A = k_in_ref.shape[1]

    @pl.when((l == 0) & (t == 0))
    def _():
        x_acc[:] = x0_ref[:].astype(jnp.float32)

    sq = wqkv_s_ref if quant else None
    so = wo_s_ref if quant else None
    s13g = w13g_s_ref if quant else None
    s13u = w13u_s_ref if quant else None
    s2 = w2_s_ref if quant else None

    # ---- attention phase (first FFN-tile iteration of each layer) ----
    @pl.when(t == 0)
    def _():
        x = x_acc[:]  # [1, d] fp32 (bf16-rounded after each residual)
        h1 = _rmsnorm(x, attn_norm_ref[0], eps)
        y = _gemv(h1, wqkv_ref, sq, g)  # [1, (H+2KH)*hd] fp32
        if has_bias:
            y = y + bqkv_ref[0].astype(jnp.float32)
        y = y.astype(jnp.bfloat16)  # projections round to activation dtype
        q = _flat_to_heads(y[:, : H * hd], H, hd)
        k = _flat_to_heads(y[:, H * hd : (H + KH) * hd], KH, hd)
        v = _flat_to_heads(y[:, (H + KH) * hd :], KH, hd)

        R = R_ref[:]
        q = jax.lax.dot_general(q, R, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        k = jax.lax.dot_general(k, R, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        # oracle rounds rotated q/k to the activation dtype
        q = q.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)

        # The kernel does NOT write the cache slab: an in-kernel aliased
        # write created a per-grid-step RAW hazard on the cache buffer
        # that blocked Mosaic from pipelining the next layer's DMAs (the
        # v1/v2 megakernel ran at baseline speed because of it). The new
        # token's K/V leave as tiny [1, KV] per-layer outputs (the caller
        # DUSes them into the cache in one XLA op) and their attention
        # contribution is merged ANALYTICALLY into the softmax below —
        # mathematically the same softmax over slots [0..pos].
        k_flat = _heads_to_flat(k.astype(jnp.float32), KH, hd, jnp.bfloat16)
        v_flat = _heads_to_flat(v, KH, hd, jnp.bfloat16)
        k_new_ref[0] = k_flat.astype(k_new_ref.dtype)
        v_new_ref[0] = v_flat.astype(v_new_ref.dtype)
        kslab = k_in_ref[0]  # [A, KV] — history (slots 0..pos-1 valid)
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
        valid = _iota2((H, A), 1) < pos  # STRICT: slot pos is k_new's
        scores = jnp.where(valid, scores, NEG_INF)
        # the new token's own score: q . k_new on ownership lanes [H, 1]
        s_new = jnp.sum(
            (q_exp.astype(jnp.float32)
             * (own_f * _rows(k_flat.astype(jnp.float32), H))), axis=-1,
            keepdims=True) * scale
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_new)
        p = jnp.exp(scores - m)
        p_new = jnp.exp(s_new - m)  # [H, 1]
        denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
        pv = jax.lax.dot_general(
            p.astype(vslab.dtype), vslab, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [H, KV]
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

        wo_out = _gemv(attn_flat, wo_ref, so, g)  # [1, d] fp32
        # residuals round through the activation dtype (layered parity)
        x = (x + wo_out).astype(jnp.bfloat16).astype(jnp.float32)
        x_acc[:] = x
        h2_buf[:] = _rmsnorm(x, ffn_norm_ref[0], eps)
        ffn_acc[:] = jnp.zeros_like(ffn_acc)

    # ---- FFN tile t (every iteration, incl. t == 0) ----
    h2 = h2_buf[:]
    gate = _gemv(h2, w13g_ref, s13g, g).astype(jnp.bfloat16)  # [1, ht]
    up = _gemv(h2, w13u_ref, s13u, g).astype(jnp.bfloat16)
    gf = gate.astype(jnp.float32)
    act = ((gf * jax.nn.sigmoid(gf)).astype(jnp.bfloat16) * up)
    part = _gemv(act, w2_ref, s2, g, lead=(0, 0))  # [1, d] fp32
    ffn_acc[:] += part

    @pl.when(t == n_tiles - 1)
    def _():
        x = (x_acc[:] + ffn_acc[:]).astype(jnp.bfloat16).astype(jnp.float32)
        x_acc[:] = x

        @pl.when(l == n_layers - 1)
        def _():
            xo = _rmsnorm(x, final_norm_ref[0], eps)
            x_out_ref[:] = xo.astype(x_out_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _layer_bytes(w):
    if isinstance(w, QuantArray):
        return (w.q.size + w.s.size * w.s.dtype.itemsize) // w.q.shape[0]
    return w.size * w.dtype.itemsize // w.shape[0]


def plan_tiles(blocks, cache_dtype=jnp.bfloat16, active_len: int = 1024):
    """Pick the FFN tile count NT for the megakernel: smallest NT (1, 2,
    4, 8) with hidden % NT == 0, (hidden/NT) % 128 == 0, group rows per
    tile a multiple of the group size, and the VMEM estimate — attention
    weights + one FFN tile set, all double-buffered — inside the budget.
    Returns NT, or None when the model cannot take the megakernel."""
    if "wqkv" not in blocks or "w13" not in blocks:
        return None
    w2 = blocks["w2"]
    quant = isinstance(w2, QuantArray)
    hidden = w2.q.shape[-2] if quant else w2.shape[-2]
    if quant and hidden % w2.group_size:
        return None
    attn = _layer_bytes(blocks["wqkv"]) + _layer_bytes(blocks["wo"])
    ffn = _layer_bytes(blocks["w13"]) + _layer_bytes(blocks["w2"])
    kv_lane = (blocks["wo"].q.shape[-2] if quant
               else blocks["wo"].shape[-2])  # = d; slab lanes = KH*hd <= d
    slab = active_len * kv_lane * jnp.dtype(cache_dtype).itemsize
    # 0.78: sized so TinyLlama-fp (NT=4 est 89 MB) fits with headroom for
    # the ~12 MB of per-iteration transients; compile fails loudly if a
    # geometry lies outside what Mosaic can actually buffer
    budget = int(_VMEM_LIMIT * 0.78)
    # COMPILED Mosaic requires the w13 gate/up column blocks (always
    # hidden/NT wide — a HALF of the fused array even at NT=1) to be
    # 128-lane aligned; the interpreter (CPU tests) has no such rule, so
    # tiny test geometries stay eligible there. Without this gate the
    # demo CLI crashed on TPU for a dim-64 fixture checkpoint.
    strict = not _interpret()
    # KT_MIN_NT (process-start-only sweep knob): floor on the tile count.
    # Smaller quant groups shrink the scale arrays enough that models can
    # fit UNTILED (NT=1) — but a 44 MB per-iteration block double-buffered
    # at the budget edge pipelines worse than two 26 MB ones (r5 A/B at
    # TinyLlama group 256).
    min_nt = int(_os.environ.get("KT_MIN_NT", "1"))
    fallback = None
    for nt in (1, 2, 4, 8):
        if nt < min_nt:
            continue
        if hidden % nt:
            continue
        if (strict or nt > 1) and (hidden // nt) % 128:
            continue
        if quant and (hidden // nt) % w2.group_size:
            continue
        est = 2 * (attn + ffn // nt + 2 * slab)
        if est > budget:
            continue
        # prefer the smallest NT with real double-buffer HEADROOM: an
        # estimate at ~97% of budget compiles but pipelines noticeably
        # worse than one more split (r5 A/B at TinyLlama group 256:
        # NT=1/88 MB 529-537 tok/s vs NT=2/53 MB 542; NT=4 regresses to
        # 458 — finer is not better either; Qwen at 65% of budget also
        # won from a split, 572 -> 580. The 0.63 threshold separates the
        # measured winners: TinyLlama-q NT=2 (58.5 MB, keep) vs Qwen NT=1
        # (61.5 MB, split))
        if est <= budget * 63 // 100:
            return nt
        if fallback is None:
            fallback = nt
    return fallback


def fits_vmem(blocks, cache_dtype=jnp.bfloat16, active_len: int = 1024) -> bool:
    return plan_tiles(blocks, cache_dtype, active_len) is not None


@functools.partial(
    jax.jit,
    static_argnames=("H", "KH", "hd", "g", "eps", "quant", "rope_style",
                     "n_tiles"),
)
def _fused_step(x0, k_cache, v_cache, pos, sin_row, cos_row, params,
                H, KH, hd, g, eps, quant, rope_style, n_tiles):
    """x0 [1, d] bf16; k/v_cache [L, A, KH*hd]; pos scalar int32.
    n_tiles: FFN column-tile count (plan_tiles) — grid is (L, n_tiles)."""
    blocks = params["blocks"]
    L, A, KV = k_cache.shape
    d = H * hd
    NT = n_tiles
    R = rope_matrix(sin_row, cos_row, rope_style, hd)

    if quant:
        wqkv, wo, w13, w2 = (blocks["wqkv"], blocks["wo"], blocks["w13"],
                             blocks["w2"])
        hidden = w2.q.shape[-2]
        ht = hidden // NT
        ngt = ht // g
        ngt_p = -(-ngt // 8) * 8
        # w2 restructured for per-tile blocks: [L, NT, ht, d] (free
        # reshape) + scales regrouped/padded to [L, NT, ngt_p, d]. Both
        # are functions of scan-invariant params — XLA hoists them out of
        # the decode scan, so the pad copy happens once per trace.
        w2q4 = w2.q.reshape(L, NT, ht, d)
        ng2 = hidden // g
        s2 = w2.s[:, :ng2].reshape(L, NT, ngt, d)
        if ngt_p != ngt:
            s2 = jnp.pad(s2, ((0, 0), (0, 0), (0, ngt_p - ngt), (0, 0)))
        wq_args = (wqkv.q, wqkv.s, wo.q, wo.s, w13.q, w13.s, w2q4, s2)
    else:
        w2 = blocks["w2"]
        hidden = w2.shape[-2]
        ht = hidden // NT
        dummy = jnp.zeros((L, 8, 128), jnp.float32)
        dummy4 = jnp.zeros((L, NT, 8, 128), jnp.float32)
        wq_args = (blocks["wqkv"], dummy, blocks["wo"], dummy,
                   blocks["w13"], dummy, w2.reshape(L, NT, ht, d), dummy4)

    has_bias = "bqkv" in blocks
    bqkv = blocks["bqkv"] if has_bias else jnp.zeros((L, 128), jnp.bfloat16)

    def lspec(arr):  # whole-per-layer block, constant across FFN tiles
        return pl.BlockSpec((1,) + arr.shape[1:], lambda l, t, p: (l,) + (0,)
                            * (arr.ndim - 1))

    w13_arr, w13_s_arr = wq_args[4], wq_args[5]
    s13_cols = w13_s_arr.shape[-1]

    def w13spec(up: bool):
        # the SAME [L, *, 2*hidden] array serves gate (cols [0, hidden))
        # and up (cols [hidden, 2*hidden)) via two refs whose column block
        # index differs by NT block units
        off = NT if up else 0
        return pl.BlockSpec((1, w13_arr.shape[1], ht),
                            lambda l, t, p, off=off: (l, 0, off + t))

    def w13sspec(up: bool):
        if not quant:
            return pl.BlockSpec((1, 8, 128), lambda l, t, p: (l, 0, 0))
        off = NT if up else 0
        return pl.BlockSpec((1, w13_s_arr.shape[1], s13_cols // (2 * NT)),
                            lambda l, t, p, off=off: (l, 0, off + t))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NT),
        in_specs=[
            pl.BlockSpec((1, d), lambda l, t, p: (0, 0)),        # x0
            pl.BlockSpec((hd, hd), lambda l, t, p: (0, 0)),      # R
            pl.BlockSpec((1, 1, d), lambda l, t, p: (l, 0, 0)),  # attn_norm
            pl.BlockSpec((1, 1, d), lambda l, t, p: (l, 0, 0)),  # ffn_norm
            pl.BlockSpec((1, 1, d), lambda l, t, p: (0, 0, 0)),  # final_norm
            lspec(wq_args[0]), lspec(wq_args[1]),                # wqkv
            lspec(wq_args[2]), lspec(wq_args[3]),                # wo
            w13spec(False), w13sspec(False),                     # gate tile
            w13spec(True), w13sspec(True),                       # up tile
            pl.BlockSpec((1, 1) + wq_args[6].shape[2:],
                         lambda l, t, p: (l, t, 0, 0)),          # w2 tile
            pl.BlockSpec((1, 1) + wq_args[7].shape[2:],
                         lambda l, t, p: (l, t, 0, 0)),          # w2 scales
            pl.BlockSpec((1, 1, bqkv.shape[-1]),
                         lambda l, t, p: (l, 0, 0)),             # bqkv
            pl.BlockSpec((1, A, KV), lambda l, t, p: (l, 0, 0)),  # k_in
            pl.BlockSpec((1, A, KV), lambda l, t, p: (l, 0, 0)),  # v_in
        ],
        out_specs=[
            pl.BlockSpec((1, d), lambda l, t, p: (0, 0)),        # x_out
            pl.BlockSpec((1, 1, KV), lambda l, t, p: (l, 0, 0)),  # k_new
            pl.BlockSpec((1, 1, KV), lambda l, t, p: (l, 0, 0)),  # v_new
        ],
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32),   # x_acc
                        pltpu.VMEM((1, d), jnp.bfloat16),  # h2_buf
                        pltpu.VMEM((1, d), jnp.float32)],  # ffn_acc
    )
    kernel = functools.partial(
        _kernel, H=H, KH=KH, hd=hd, g=g, eps=eps, n_layers=L, n_tiles=NT,
        quant=quant, has_bias=has_bias)
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
      wq_args[0], wq_args[1], wq_args[2], wq_args[3],
      wq_args[4], wq_args[5],  # gate refs
      wq_args[4], wq_args[5],  # up refs (same arrays, different blocks)
      wq_args[6], wq_args[7],
      bqkv[:, None] if bqkv.ndim == 2 else bqkv,
      k_cache, v_cache)
    # one DUS installs every layer's new K/V row at `pos` (donated caches
    # update in place; [L, 1, KV] is tiny next to the weight stream)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new, (0, pos.astype(jnp.int32), 0))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new, (0, pos.astype(jnp.int32), 0))
    return x_out, k_cache, v_cache


def fused_decode_step(cfg, params, x0, k_cache, v_cache, pos, sin, cos):
    """One full decode-layer-stack forward for B=1.

    x0: [1, d] activation-dtype embedding row; k/v_cache [L, A, KH*hd]
    (A = active bucketed length, caller guarantees pos < A); pos scalar;
    sin/cos: the model's rope cache [seq_len, hd/2]. Returns
    (x_final [1, d] — final-norm'd, pre-lm_head), k_cache, v_cache).
    """
    blocks = params["blocks"]
    quant = isinstance(blocks["wqkv"], QuantArray)
    hd = cfg.head_dim
    H = cfg.n_heads
    KH = cfg.n_kv_heads
    g = blocks["wqkv"].group_size if quant else 0
    nt = plan_tiles(blocks, k_cache.dtype, k_cache.shape[1])
    assert nt is not None, "model does not fit the megakernel VMEM budget"
    p = jnp.minimum(pos, cfg.seq_len - 1)
    sin_row = sin[p]
    cos_row = cos[p]
    return _fused_step(x0, k_cache, v_cache, pos, sin_row, cos_row, params,
                       H=H, KH=KH, hd=hd, g=g, eps=cfg.norm_eps,
                       quant=quant, rope_style=cfg.rope_style, n_tiles=nt)


# ---------------------------------------------------------------------------
# Multi-step greedy chunk kernel: `steps` decode iterations in ONE
# pallas_call. Extends the single-step megakernel with an in-kernel
# lm_head (vocab-tiled), running argmax (greedy sampling), and an async
# DMA of the next token's embedding row — so there are ZERO per-step
# launch boundaries; the only XLA work per chunk is one DUS installing
# the chunk's K/V rows. Grid: (steps, L*NT + n_vocab_tiles).
#
# Intra-chunk attention: the blocked k/v slabs hold only PRE-chunk history
# (slots < pos0); the chunk's own K/V rows accumulate in the k_new/v_new
# output blocks (whole-array blocks, constant index -> resident for the
# entire kernel, flushed once at the end) and are read back for the
# recent-token scores; the current token merges analytically as before.


def _pick_vt(Vpad: int, d: int, itemsize: int,
             budget: int = 17 * 1024 * 1024) -> int:
    """Vocab tile: largest 128-multiple divisor of Vpad whose weight tile
    (d x VT) fits the budget."""
    best = 128
    for c in range(128, Vpad + 1, 128):
        if Vpad % c == 0 and c * d * itemsize <= budget:
            best = c
    return best


def _chunk_kernel(pos_ref,
                  x0_ref, R_ref, attn_norm_ref, ffn_norm_ref, final_norm_ref,
                  wqkv_ref, wqkv_s_ref, wo_ref, wo_s_ref,
                  w13g_ref, w13g_s_ref, w13u_ref, w13u_s_ref,
                  w2_ref, w2_s_ref, bqkv_ref,
                  k_in_ref, v_in_ref, lm_ref, lm_s_ref, emb_ref,
                  tokens_ref, k_new_ref, v_new_ref,
                  x_acc, h2_buf, ffn_acc, emb_buf, best_v, tok_s, emb_sem,
                  *, H, KH, hd, g, eps, n_layers, n_tiles, quant, has_bias,
                  steps, n_vt, vocab, lm_quant):
    s = pl.program_id(0)
    i = pl.program_id(1)
    NT = n_tiles
    PH = n_layers * NT
    pos0 = pos_ref[0]
    pos = pos0 + s
    d = H * hd
    KV = KH * hd
    kv_mul = H // KH
    A = k_in_ref.shape[1]

    sq = wqkv_s_ref if quant else None
    so = wo_s_ref if quant else None
    s13g = w13g_s_ref if quant else None
    s13u = w13u_s_ref if quant else None
    s2 = w2_s_ref if quant else None
    slm = lm_s_ref if lm_quant else None

    # ---- step bring-up: x = embedding of this step's input token ----
    @pl.when(i == 0)
    def _():
        @pl.when(s == 0)
        def _():
            x_acc[:] = x0_ref[:].astype(jnp.float32)
            # not-yet-written K/V rows are READ (masked to zero weight)
            # before being written — an uninitialized buffer poisons the
            # attention with NaN (0 * NaN = NaN)
            k_new_ref[:] = jnp.zeros(k_new_ref.shape, k_new_ref.dtype)
            v_new_ref[:] = jnp.zeros(v_new_ref.shape, v_new_ref.dtype)

        @pl.when(s > 0)
        def _():
            pltpu.make_async_copy(emb_ref.at[tok_s[0] // 2], emb_buf,
                                  emb_sem).wait()
            # fold-select row (tok % 2) of the [2, d] pair without a
            # 1-sublane slice
            r = jax.lax.rem(tok_s[0], 2)
            selr = (jnp.arange(2, dtype=jnp.int32)[None, :] == r
                    ).astype(jnp.float32)  # [1, 2]
            row = jax.lax.dot_general(
                selr, emb_buf[:].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x_acc[:] = row

    l = i // NT
    t = jax.lax.rem(i, NT)

    # ---- layer phase ----
    @pl.when(i < PH)
    def _():
        @pl.when(t == 0)
        def _():
            x = x_acc[:]
            h1 = _rmsnorm(x, attn_norm_ref[0], eps)
            y = _gemv(h1, wqkv_ref, sq, g)
            if has_bias:
                y = y + bqkv_ref[0].astype(jnp.float32)
            y = y.astype(jnp.bfloat16)
            q = _flat_to_heads(y[:, : H * hd], H, hd)
            k = _flat_to_heads(y[:, H * hd : (H + KH) * hd], KH, hd)
            v = _flat_to_heads(y[:, (H + KH) * hd :], KH, hd)
            R = R_ref[0]
            q = jax.lax.dot_general(q, R, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            k = jax.lax.dot_general(k, R, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            q = q.astype(jnp.bfloat16)
            k = k.astype(jnp.bfloat16)
            k_flat = _heads_to_flat(k.astype(jnp.float32), KH, hd,
                                    jnp.bfloat16)
            v_flat = _heads_to_flat(v, KH, hd, jnp.bfloat16)
            # rows live on dim 0 as (l*steps + s) — Mosaic cannot prove
            # 8-alignment for a dynamic SUBLANE store, but dim-0 dynamic
            # indexing of a (N, 1, KV) ref is unrestricted
            k_new_ref[pl.ds(l * steps + s, 1), :, :] = (
                k_flat[None].astype(k_new_ref.dtype))
            v_new_ref[pl.ds(l * steps + s, 1), :, :] = (
                v_flat[None].astype(v_new_ref.dtype))

            own = (_iota2((H, KV), 1) // hd
                   == _iota2((H, KV), 0) // kv_mul)
            own_f = own.astype(jnp.float32)
            q_exp = jnp.where(own, jnp.concatenate([q] * KH, axis=1),
                              jnp.zeros((), jnp.bfloat16))
            kslab = k_in_ref[0]
            vslab = v_in_ref[0]
            prec = (jax.lax.Precision.HIGHEST
                    if kslab.dtype == jnp.float32 else None)
            scale = jax.lax.rsqrt(jnp.float32(hd))
            sc = jax.lax.dot_general(
                q_exp.astype(kslab.dtype), kslab, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ) * scale  # [H, A] — pre-chunk history
            sc = jnp.where(_iota2((H, A), 1) < pos0, sc, NEG_INF)
            # this chunk's earlier tokens (rows r < s of k_new)
            krec = k_new_ref[pl.ds(l * steps, steps), 0, :
                             ].astype(jnp.bfloat16)  # [steps, KV]
            vrec = v_new_ref[pl.ds(l * steps, steps), 0, :
                             ].astype(jnp.bfloat16)
            rec = jax.lax.dot_general(
                q_exp.astype(krec.dtype), krec, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ) * scale  # [H, steps]
            rec = jnp.where(_iota2((H, steps), 1) < s, rec, NEG_INF)
            s_new = jnp.sum(
                (q_exp.astype(jnp.float32)
                 * (own_f * _rows(k_flat.astype(jnp.float32), H))),
                axis=-1, keepdims=True) * scale
            m = jnp.maximum(
                jnp.maximum(jnp.max(sc, axis=-1, keepdims=True),
                            jnp.max(rec, axis=-1, keepdims=True)), s_new)
            p = jnp.exp(sc - m)
            prc = jnp.exp(rec - m)
            p_new = jnp.exp(s_new - m)
            denom = (jnp.sum(p, axis=-1, keepdims=True)
                     + jnp.sum(prc, axis=-1, keepdims=True) + p_new)
            pv = jax.lax.dot_general(
                p.astype(vslab.dtype), vslab, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            pv = pv + jax.lax.dot_general(
                prc.astype(vrec.dtype), vrec, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            pv = pv + p_new * (own_f * _rows(v_flat.astype(jnp.float32), H))
            pv = pv / denom
            sel = (_iota2((KV, hd), 0) % hd == _iota2((KV, hd), 1)
                   ).astype(jnp.float32)
            attn = jax.lax.dot_general(
                jnp.where(own, pv, 0.0), sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            attn_flat = _heads_to_flat(attn.astype(jnp.bfloat16), H, hd,
                                       jnp.bfloat16)
            wo_out = _gemv(attn_flat, wo_ref, so, g)
            x = (x + wo_out).astype(jnp.bfloat16).astype(jnp.float32)
            x_acc[:] = x
            h2_buf[:] = _rmsnorm(x, ffn_norm_ref[0], eps)
            ffn_acc[:] = jnp.zeros_like(ffn_acc)

        h2 = h2_buf[:]
        gate = _gemv(h2, w13g_ref, s13g, g).astype(jnp.bfloat16)
        up = _gemv(h2, w13u_ref, s13u, g).astype(jnp.bfloat16)
        gf = gate.astype(jnp.float32)
        act = ((gf * jax.nn.sigmoid(gf)).astype(jnp.bfloat16) * up)
        part = _gemv(act, w2_ref, s2, g, lead=(0, 0))
        ffn_acc[:] += part

        @pl.when(t == NT - 1)
        def _():
            x = (x_acc[:] + ffn_acc[:]).astype(jnp.bfloat16
                                               ).astype(jnp.float32)
            x_acc[:] = x

            @pl.when(l == n_layers - 1)
            def _():
                # x_final (pre-lm_head) parked in h2_buf for the vocab phase
                h2_buf[:] = _rmsnorm(x, final_norm_ref[0], eps)

    # ---- vocab (lm_head + argmax) phase ----
    @pl.when(i >= PH)
    def _():
        j = i - PH

        @pl.when(j == 0)
        def _():
            best_v[0] = NEG_INF
            tok_s[0] = 0

        xf = h2_buf[:]  # [1, d] bf16 final-norm'd
        VT = lm_ref.shape[-1]
        y = _gemv(xf, lm_ref, slm, g, lead=())  # [1, VT] fp32
        lane = _iota2((1, VT), 1)
        y = jnp.where(j * VT + lane < vocab, y, NEG_INF)
        tile_max = jnp.max(y)
        # first-max lane (ties resolve like jnp.argmax)
        tile_arg = jnp.min(jnp.where(y[0] == tile_max, lane[0], vocab))

        @pl.when(tile_max > best_v[0])
        def _():
            best_v[0] = tile_max
            tok_s[0] = j * VT + tile_arg

        @pl.when(j == n_vt - 1)
        def _():
            tok = tok_s[0]
            tokens_ref[pl.ds(s, 1), :, :] = jnp.full((1, 1, 128), tok,
                                                     jnp.int32)

            @pl.when(s < steps - 1)
            def _():
                pltpu.make_async_copy(emb_ref.at[tok // 2], emb_buf,
                                      emb_sem).start()


@functools.partial(
    jax.jit,
    static_argnames=("H", "KH", "hd", "g", "eps", "quant", "rope_style",
                     "n_tiles", "steps", "lm_quant"),
)
def _fused_chunk(x0, k_cache, v_cache, pos, sin, cos, params,
                 H, KH, hd, g, eps, quant, rope_style, n_tiles, steps,
                 lm_quant):
    """`steps` greedy decode iterations in one pallas_call. Returns
    (tokens [steps] int32, k_new [L, steps, KV], v_new [L, steps, KV]) —
    the caller DUSes the new rows into the cache at pos."""
    blocks = params["blocks"]
    L, A, KV = k_cache.shape
    d = H * hd
    NT = n_tiles

    # rope matrices for every step of the chunk
    ppos = jnp.minimum(pos + jnp.arange(steps), sin.shape[0] - 1)
    R_all = jax.vmap(lambda sr, cr: rope_matrix(sr, cr, rope_style, hd))(
        sin[ppos], cos[ppos])  # [steps, hd, hd]

    if quant:
        wqkv, wo, w13, w2 = (blocks["wqkv"], blocks["wo"], blocks["w13"],
                             blocks["w2"])
        hidden = w2.q.shape[-2]
        ht = hidden // NT
        ngt = ht // g
        ngt_p = -(-ngt // 8) * 8
        w2q4 = w2.q.reshape(L, NT, ht, d)
        ng2 = hidden // g
        s2 = w2.s[:, :ng2].reshape(L, NT, ngt, d)
        if ngt_p != ngt:
            s2 = jnp.pad(s2, ((0, 0), (0, 0), (0, ngt_p - ngt), (0, 0)))
        wq_args = (wqkv.q, wqkv.s, wo.q, wo.s, w13.q, w13.s, w2q4, s2)
    else:
        w2 = blocks["w2"]
        hidden = w2.shape[-2]
        ht = hidden // NT
        dummy = jnp.zeros((L, 8, 128), jnp.float32)
        dummy4 = jnp.zeros((L, NT, 8, 128), jnp.float32)
        wq_args = (blocks["wqkv"], dummy, blocks["wo"], dummy,
                   blocks["w13"], dummy, w2.reshape(L, NT, ht, d), dummy4)

    lmw = params["lm_head"]
    if lm_quant:
        V = lmw.q.shape[-1]
        VT = _pick_vt(-(-V // 2048) * 2048, d, 1)
        Vpad = -(-V // VT) * VT
        lm_args = (jnp.pad(lmw.q, ((0, 0), (0, Vpad - V))),
                   jnp.pad(lmw.s, ((0, 0), (0, Vpad - V))))
    else:
        V = lmw.shape[-1]
        VT = _pick_vt(-(-V // 2048) * 2048, d, lmw.dtype.itemsize)
        lm_dtype_pad = -(-V // VT) * VT
        Vpad = lm_dtype_pad
        lm_args = (jnp.pad(lmw, ((0, 0), (0, Vpad - V))),
                   jnp.zeros((8, 128), jnp.float32))
    n_vt = Vpad // VT

    has_bias = "bqkv" in blocks
    bqkv = blocks["bqkv"] if has_bias else jnp.zeros((L, 128), jnp.bfloat16)
    # [ceil(V/2), 2, d]: the row gather slices only the UNTILED leading
    # dim (dim-0), and the middle dim stays size-2 so no 1-sublane bf16
    # slice exists anywhere; the kernel fold-selects the row by tok % 2
    emb2 = params["tok_emb"].astype(jnp.bfloat16)
    if emb2.shape[0] % 2:
        emb2 = jnp.pad(emb2, ((0, 1), (0, 0)))
    emb = emb2.reshape(-1, 2, emb2.shape[-1])

    PH = L * NT
    w13_arr, w13_s_arr = wq_args[4], wq_args[5]
    s13_cols = w13_s_arr.shape[-1]

    def lidx(ii):
        return jnp.minimum(ii // NT, L - 1)

    def tidx(ii):
        # FFN tile index, CLAMPED during the vocab phase: a plain
        # rem(ii, NT) keeps cycling 0..NT-1 after the layer phase ends, so
        # Pallas would re-fetch last-layer w13/w2 tiles once per vocab tile
        # — pure wasted HBM bandwidth (ADVICE r4)
        return jnp.where(ii < PH, jax.lax.rem(ii, NT), NT - 1)

    def lspec(arr):
        nz = arr.ndim - 1
        return pl.BlockSpec((1,) + arr.shape[1:],
                            lambda s, ii, p: (lidx(ii),) + (0,) * nz)

    def w13spec(up: bool):
        off = NT if up else 0
        return pl.BlockSpec(
            (1, w13_arr.shape[1], ht),
            lambda s, ii, p, off=off: (lidx(ii), 0, off + tidx(ii)))

    def w13sspec(up: bool):
        if not quant:
            return pl.BlockSpec((1, 8, 128), lambda s, ii, p: (lidx(ii), 0, 0))
        off = NT if up else 0
        return pl.BlockSpec(
            (1, w13_s_arr.shape[1], s13_cols // (2 * NT)),
            lambda s, ii, p, off=off: (lidx(ii), 0, off + tidx(ii)))

    def lmspec(arr):
        # pin tile 0 during the layer phase (prefetches it); tile j in the
        # vocab phase
        def im(s, ii, p):
            j = jnp.clip(ii - PH, 0, n_vt - 1)
            return (0, j) if arr.ndim == 2 else (0, j)
        return pl.BlockSpec((arr.shape[0], VT), im)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps, PH + n_vt),
        in_specs=[
            pl.BlockSpec((1, d), lambda s, ii, p: (0, 0)),         # x0
            pl.BlockSpec((1, hd, hd), lambda s, ii, p: (s, 0, 0)),  # R
            pl.BlockSpec((1, 1, d), lambda s, ii, p: (lidx(ii), 0, 0)),
            pl.BlockSpec((1, 1, d), lambda s, ii, p: (lidx(ii), 0, 0)),
            pl.BlockSpec((1, 1, d), lambda s, ii, p: (0, 0, 0)),
            lspec(wq_args[0]), lspec(wq_args[1]),
            lspec(wq_args[2]), lspec(wq_args[3]),
            w13spec(False), w13sspec(False),
            w13spec(True), w13sspec(True),
            pl.BlockSpec((1, 1) + wq_args[6].shape[2:],
                         lambda s, ii, p: (lidx(ii), tidx(ii), 0, 0)),
            pl.BlockSpec((1, 1) + wq_args[7].shape[2:],
                         lambda s, ii, p: (lidx(ii), tidx(ii), 0, 0)),
            pl.BlockSpec((1, 1, bqkv.shape[-1]),
                         lambda s, ii, p: (lidx(ii), 0, 0)),
            pl.BlockSpec((1, A, KV), lambda s, ii, p: (lidx(ii), 0, 0)),
            pl.BlockSpec((1, A, KV), lambda s, ii, p: (lidx(ii), 0, 0)),
            lmspec(lm_args[0]), lmspec(lm_args[1]),
            pl.BlockSpec(memory_space=pl.ANY),                    # tok_emb
        ],
        out_specs=[
            pl.BlockSpec((steps, 1, 128), lambda s, ii, p: (0, 0, 0)),
            pl.BlockSpec((L * steps, 1, KV), lambda s, ii, p: (0, 0, 0)),
            pl.BlockSpec((L * steps, 1, KV), lambda s, ii, p: (0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),    # x_acc
            pltpu.VMEM((1, d), jnp.bfloat16),   # h2_buf / x_final
            pltpu.VMEM((1, d), jnp.float32),    # ffn_acc
            pltpu.VMEM((2, d), jnp.bfloat16),   # emb_buf (row pair)
            pltpu.SMEM((1,), jnp.float32),      # best_v
            pltpu.SMEM((1,), jnp.int32),        # tok_s
            pltpu.SemaphoreType.DMA,            # emb_sem
        ],
    )
    kernel = functools.partial(
        _chunk_kernel, H=H, KH=KH, hd=hd, g=g, eps=eps, n_layers=L,
        n_tiles=NT, quant=quant, has_bias=has_bias, steps=steps,
        n_vt=n_vt, vocab=V, lm_quant=lm_quant)
    tokens, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((steps, 1, 128), jnp.int32),
                   # fp32: bf16's 2-sublane packing rejects 1-row slices
                   jax.ShapeDtypeStruct((L * steps, 1, KV), jnp.float32),
                   jax.ShapeDtypeStruct((L * steps, 1, KV), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.reshape(pos, (1,)).astype(jnp.int32),
      x0, R_all,
      params["blocks"]["attn_norm"][:, None].astype(jnp.float32),
      params["blocks"]["ffn_norm"][:, None].astype(jnp.float32),
      jnp.reshape(params["final_norm"], (1, 1, d)).astype(jnp.float32),
      wq_args[0], wq_args[1], wq_args[2], wq_args[3],
      wq_args[4], wq_args[5], wq_args[4], wq_args[5],
      wq_args[6], wq_args[7],
      bqkv[:, None] if bqkv.ndim == 2 else bqkv,
      k_cache, v_cache, lm_args[0], lm_args[1], emb)
    toks = tokens[:, 0, 0]
    k_new = k_new.reshape(L, steps, KV).astype(k_cache.dtype)
    v_new = v_new.reshape(L, steps, KV).astype(v_cache.dtype)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new, (0, pos.astype(jnp.int32), 0))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new, (0, pos.astype(jnp.int32), 0))
    return toks, k_cache, v_cache


def fused_decode_chunk(cfg, params, x0, k_cache, v_cache, pos, sin, cos,
                       steps: int):
    """`steps` greedy decode iterations for B=1 in one kernel launch.
    x0 [1, d] = embedding of the CURRENT token; returns (tokens [steps]
    — the sampled continuation, k_cache, v_cache)."""
    blocks = params["blocks"]
    quant = isinstance(blocks["wqkv"], QuantArray)
    g = blocks["wqkv"].group_size if quant else 0
    nt = plan_tiles(blocks, k_cache.dtype, k_cache.shape[1])
    assert nt is not None, "model does not fit the megakernel VMEM budget"
    lm_quant = isinstance(params["lm_head"], QuantArray)
    return _fused_chunk(x0, k_cache, v_cache, pos, sin, cos, params,
                        H=cfg.n_heads, KH=cfg.n_kv_heads, hd=cfg.head_dim,
                        g=g, eps=cfg.norm_eps, quant=quant,
                        rope_style=cfg.rope_style, n_tiles=nt, steps=steps,
                        lm_quant=lm_quant)

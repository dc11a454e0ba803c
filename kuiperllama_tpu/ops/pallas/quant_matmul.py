"""Fused group-dequant INT8 matmul Pallas kernel.

TPU-native replacement for the reference's dequant-fused GEMV
(kuiper/source/op/kernels/cuda/matmul_kernel.cu:56-87
`matmul_kernel_cu_fp32int8`): weights stream from HBM as int8 (4x less
bandwidth than fp32 — decode is weight-bandwidth-bound), dequantization
happens on-chip in VMEM against the group scales, and the contraction runs
on the MXU with fp32 accumulation.

Two modes:
  fast  — int8 -> bf16 cast, bf16 scale multiply, single bf16 MXU pass.
          Error ~3e-3 relative — the same class as bf16 activations.
  exact — fp32 dequant + fp32 HIGHEST matmul (6 MXU passes). Bit-accurate
          against the fp32 XLA oracle; used by parity tests and fp32 runs.

Layout (see quant.py): q int8 [in, out], scales fp32 [in/g, out] (rows may
be 8-padded), groups along the reduction dim. Grid is (out_tiles, in_tiles)
with the reduction innermost; partials accumulate in a VMEM scratch, the
output tile is written on the last reduction step.

Performance rules learned the hard way on this hardware (r2):
  * NEVER hand the kernel a slice of a bigger array — a pallas_call operand
    cannot fuse a dynamic-slice, so XLA materializes a copy of the whole
    operand first. Inside the per-layer scan that doubles decode's HBM
    traffic; the layer-indexed variant below exists for exactly this.
  * NEVER pad weights to tile multiples on the hot path (same reason);
    _pick_tile chooses tiles that divide the true shape.
  * The chip reports "TPU v5 lite" but has 128 MB VMEM; the default 16 MB
    scoped budget rejects whole-reduction tiles (vmem_limit_bytes=96MB).
  * WHOLE-REDUCTION tiles (TK == K) stream ~2x faster than TK=2048 tiling
    at decode shapes: measured wo [4096, 4096] 533 -> 1116 GB/s, w2
    [11008, 4096] 860 GB/s (tools/bench_kernels.py, r3). block_in defaults
    to 4096 so every 7B shape takes TK = K; keep TN at 512 (Mosaic compile
    explodes on [K, 1024] whole-reduction dequant blocks).
  * bf16 scales are free in fast mode (the kernel casts anyway) and cut
    the scale stream in half — quant.cast_scales at load.
  * The per-element dequant multiply is VPU-throughput-bound and does NOT
    hide behind the MXU: ablating it alone is worth ~7 tok/s at 7B. Fast
    mode therefore (a) issues dequant+dot per reduction SUB-chunk so Mosaic
    can overlap chunk i+1's VPU work with chunk i's MXU pass, and (b) for
    M == 1 (decode GEMV) switches to the block-diagonal path (_kernel_diag):
    P = blockdiag(x) @ q computes per-GROUP partials in one MXU call (<= 64
    rows keeps it weight-load-bound, same as the padded M=8 GEMV), and the
    scales apply to the [ng, TN] partials — 1/64th the VPU work, and in
    fp32, so it is also slightly MORE accurate.
End-to-end with these rules: Llama-2-7B INT8 B=1 decode at 91.4 tok/s =
76.1% of the 819 GB/s SPEC-bandwidth roofline, 84% of the demonstrated
742 GB/s stream (BENCH_r03; r2 was 61%/72.6 tok/s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant import QuantArray

_DEFAULT_MODE = "fast"
# Default tile caps (overridable for sweeps): TN <= block_out along the
# output dim, TK <= block_in along the reduction. 512/4096 won the r3
# sweep at 7B decode shapes (tools/bench_kernels.py).
# PROCESS-START-ONLY knobs: these env vars are read once at import (and
# KT_SUB_CHUNKS at first trace) and baked into the jitted kernel cache —
# changing them mid-process silently keeps the old tiling. Sweep harnesses
# must spawn a fresh interpreter per setting (tools/bench_kernels.py does).
import os as _os

_BLOCK_OUT = int(_os.environ.get("KT_BLOCK_OUT", "512"))
_BLOCK_IN = int(_os.environ.get("KT_BLOCK_IN", "4096"))
# M=1 diag-eligible GEMVs route through the XLA block-diagonal path by
# DEFAULT (KT_XLA_DIAG=0 restores the Pallas diag kernel): XLA's dot
# emitter fuses the int8 cast + layer slice and won the r4 interleaved
# A/B on the 7B headline 4/4 samples (93.0-93.7 vs 91.1-92.4 tok/s,
# ~+1.4%) — it removes a pallas_call boundary per projection.
_XLA_DIAG = _os.environ.get("KT_XLA_DIAG", "1") == "1"


def set_quant_matmul_mode(mode: str):
    """Set the global default ("fast" | "exact")."""
    global _DEFAULT_MODE
    assert mode in ("fast", "exact"), mode
    _DEFAULT_MODE = mode


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _pick_tile(dim: int, quantum: int, cap: int):
    """Largest multiple of `quantum` that DIVIDES dim and is <= cap.

    Padding a weight to make the grid divide is not an option on the hot
    path: jnp.pad materializes a full copy of the (possibly [L, K, N]
    stacked) weight — for Llama-2-7B's w2 that is gigabytes of HBM traffic
    per call. Returns None if nothing divides (caller falls back to pad)."""
    for k in range(min(cap, dim) // quantum, 0, -1):
        t = k * quantum
        if dim % t == 0:
            return t
    return None


def _sub_chunk(tk: int, g: int) -> int:
    """Reduction sub-chunk for intra-tile VPU/MXU overlap: the smallest
    divisor of tk that is a multiple of lcm(g, 128) (group- and lane-
    aligned) giving at most 8 chunks."""
    import math

    lcm = g * 128 // math.gcd(g, 128)
    max_chunks = int(_os.environ.get("KT_SUB_CHUNKS", "8"))
    for n in range(max_chunks, 1, -1):
        sub = tk // n
        if tk % n == 0 and sub % lcm == 0:
            return sub
    return tk


# Cap on the M (rows) block: decode GEMVs (M <= 8) take one block, but a
# batched 7B prefill feeds M = B*T in the thousands — an uncapped [M, K]
# x-block (64 MB at M=8192, K=4096) blows the VMEM budget at compile time.
_BLOCK_M = 512


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, group_size, n_k, mode,
            k_axis):
    k = pl.program_id(k_axis)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tk, tn = q_ref.shape
    ng = tk // group_size
    g = group_size
    if mode == "fast":
        # int8 payloads are exact in bf16; only the scale multiply rounds.
        # [:ng]: the scales block may carry 8-alignment padding rows.
        # The dequant (cast+scale, VPU) and the dot (MXU) are issued per
        # SUB-chunk of the reduction so Mosaic can overlap chunk i+1's
        # dequant with chunk i's MXU pass — one whole-tile dequant feeding
        # one dot serializes ~1.3us of VPU behind every ~2.2us MXU pass,
        # which turns a DMA-bound stream compute-bound at decode shapes.
        sub = _sub_chunk(tk, g)
        xb = x_ref[:].astype(jnp.bfloat16)
        sb_all = s_ref[:][:ng].astype(jnp.bfloat16)
        acc = None
        for i in range(tk // sub):
            qb = q_ref[i * sub:(i + 1) * sub, :].astype(jnp.bfloat16)
            sb = sb_all[i * (sub // g):(i + 1) * (sub // g)]
            w = (qb.reshape(sub // g, g, tn)
                 * sb[:, None, :]).reshape(sub, tn)
            part = jax.lax.dot_general(
                xb[:, i * sub:(i + 1) * sub], w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        acc_ref[:] += acc
    else:
        qf = q_ref[:].astype(jnp.float32).reshape(ng, group_size, tn)
        w = (qf * s_ref[:][:ng][:, None, :]).reshape(tk, tn)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# GEMV (M == 1) fast path: the per-element dequant multiply is VPU
# throughput-bound (~0.3us per 512-wide tile) and does NOT hide behind the
# MXU pass, costing ~12% of Llama-2-7B decode. Instead, compute the
# GROUP-PARTIAL matrix P[i, n] = sum_{k in group i} x[k] * q[k, n] with one
# MXU dot of blockdiag(x) [ng, K] against the raw int8 tile — ng <= 64 rows
# keeps the MXU weight-load-bound exactly like the M=8 GEMV — then apply
# scales to P ([ng, TN] elements, 1/64th the VPU work) and column-reduce.
# Bonus: the scale multiply now happens in fp32 on fp32 partials, so this
# path is MORE accurate than the generic fast mode. Restricted to
# whole-reduction tiles (n_k == 1) and ng <= _DIAG_MAX_GROUPS.
# KT_DIAG_MAX is a process-start-only sweep knob (like KT_BLOCK_*). The r4
# end-to-end A/B at TinyLlama (cap 64 vs 176, i.e. w2's 88 groups on the
# generic vs diag path) was noise-level (402.0 vs 405.2 tok/s); per-shape
# marginal timings through the tunnel were too jittery to resolve µs-scale
# kernels (tools/exp_diag.py). Default stays 64 — the r3-validated
# configuration for the 7B headline — until a cleaner measurement says
# otherwise; small models now take the fused_decode megakernel anyway.
_DIAG_MAX_GROUPS = int(_os.environ.get("KT_DIAG_MAX", "64"))


def _kernel_diag(a_ref, q_ref, s_ref, o_ref):
    # a_ref: blockdiag(x) [SROWS, K], built by the caller in XLA (one
    # ~512 KB materialization per call; its index_map is constant so Pallas
    # fetches it exactly once) — padded A rows are zero, so their partials
    # vanish regardless of scale padding content.
    qb = q_ref[:].astype(jnp.bfloat16)
    P = jax.lax.dot_general(
        a_ref[:], qb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = jnp.sum(P * s_ref[:].astype(jnp.float32), axis=0)
    o_ref[:] = jnp.broadcast_to(y[None, :], o_ref.shape).astype(o_ref.dtype)


def _blockdiag(x, ngp: int, g: int):
    """[1_or_more, K] bf16 -> blockdiag of row 0: A[i, k] = x[0, k] if
    k // g == i else 0, shape [ngp, K]."""
    K = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ngp, K), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (ngp, K), 1) // g
    return jnp.where(rows == grp, x[0][None, :].astype(jnp.bfloat16),
                     jnp.bfloat16(0))


def _interpret() -> bool:
    # Compiled Mosaic kernels need real TPU hardware; CPU tests use the
    # Pallas interpreter (same semantics, slow).
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_out", "block_in", "out_dtype", "mode"),
)
def _quant_matmul_2d(x, q, s, group_size: int, block_out: int = 512,
                     block_in: int = 4096, out_dtype=None, mode: str = "fast"):
    """x [M, K] @ dequant(q [K, N], s [K/g, N]) -> [M, N]."""
    M, K = x.shape
    K2, N = q.shape
    assert K == K2, (x.shape, q.shape)
    g = group_size
    out_dtype = out_dtype or x.dtype

    # prefer tiles that divide exactly — padding copies the whole weight.
    # TK quantum is srows_min*g: the scales block [TK//g, TN] needs >= 8
    # sublanes for fp32 scales, >= 16 for bf16 (Mosaic tiling rule) unless
    # it spans the whole (8-padded) axis.
    srows_min = 16 if s.dtype.itemsize == 2 else 8
    TN = _pick_tile(N, 128, block_out) or min(block_out, _round_up(N, 128))
    TK = (_pick_tile(K, srows_min * g, block_in)
          or (K if K * TN <= (8 << 20) else None)
          or min(block_in, _round_up(K, srows_min * g)))
    assert TK % g == 0, (TK, g)
    n_n, n_k = _cdiv(N, TN), _cdiv(K, TK)
    TM = _round_up(M, 8)

    # Pad inputs so the grid covers them exactly (zero rows/cols contribute
    # nothing to the contraction).
    if M != TM:
        x = jnp.pad(x, ((0, TM - M), (0, 0)))
    if K % TK or N % TN:
        x = jnp.pad(x, ((0, 0), (0, n_k * TK - K)))
        q = jnp.pad(q, ((0, n_k * TK - K), (0, n_n * TN - N)))
        s = s[: K // g]  # drop any 8-alignment padding rows before re-pad
        s = jnp.pad(s, ((0, (n_k * TK) // g - K // g), (0, n_n * TN - N)))

    # TK == K: the single scales block spans its whole (possibly 8-padded)
    # row axis; the kernel slices back to the real group count. The row
    # count must still be sublane-aligned (Mosaic pads the backing memref
    # to the tile quantum and cannot slice a misaligned block out of it:
    # K=11008/g=64 gives 172 rows, which compiles only padded to 176) —
    # production pre-pads at load (params.to_device); self-heal otherwise.
    if n_k == 1 and s.shape[0] % srows_min:
        s = jnp.pad(s, ((0, -s.shape[0] % srows_min), (0, 0)))
    SROWS = TK // g if n_k > 1 else s.shape[0]

    if (mode == "fast" and M == 1 and n_k == 1 and K % g == 0
            and K // g <= _DIAG_MAX_GROUPS):
        a = _blockdiag(x, SROWS, g)
        out = pl.pallas_call(
            _kernel_diag,
            grid=(n_n, 1),
            in_specs=[
                pl.BlockSpec((SROWS, TK), lambda j, k: (0, 0)),
                pl.BlockSpec((TK, TN), lambda j, k: (0, j)),
                pl.BlockSpec((SROWS, TN), lambda j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda j, k: (0, j)),
            out_shape=jax.ShapeDtypeStruct((TM, n_n * TN), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * SROWS * K * N,
                bytes_accessed=SROWS * K * 2 + K * N + SROWS * N * 4
                + TM * N * 4,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(a, q, s)
        return out[:M, :N]

    # M-grid: prefill feeds M = B*T in the thousands; cap the rows block
    # (decode GEMVs keep a single block)
    TMb = min(TM, _BLOCK_M)
    n_m = _cdiv(TM, TMb)
    if TM != n_m * TMb:
        x = jnp.pad(x, ((0, n_m * TMb - TM), (0, 0)))
    kernel = functools.partial(_kernel, group_size=g, n_k=n_k, mode=mode,
                               k_axis=2)
    out = pl.pallas_call(
        kernel,
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((TMb, TK), lambda m, j, k: (m, k)),
            pl.BlockSpec((TK, TN), lambda m, j, k: (k, j)),
            pl.BlockSpec((SROWS, TN), lambda m, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((TMb, TN), lambda m, j, k: (m, j)),
        out_shape=jax.ShapeDtypeStruct((n_m * TMb, n_n * TN), out_dtype),
        scratch_shapes=[pltpu.VMEM((TMb, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # this chip has 128 MB VMEM; the default 16 MB scoped budget
            # rejects whole-reduction tiles (w2 at K=11008 needs ~18 MB)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * TM * K * N,
            bytes_accessed=TM * K * 4 + n_m * K * N + (K // g) * N * 4
            + TM * N * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, q, s)
    return out[:M, :N]


def quant_matmul(x, w: QuantArray, mode: str | None = None,
                 block_out: int | None = None, block_in: int | None = None):
    """x [..., in] @ QuantArray([in, out]) -> [..., out] in x.dtype."""
    block_out = block_out or _BLOCK_OUT
    block_in = block_in or _BLOCK_IN
    lead = x.shape[:-1]
    if (_XLA_DIAG
            and (mode or _DEFAULT_MODE) == "fast"
            and x.reshape(-1, x.shape[-1]).shape[0] == 1
            and x.shape[-1] % w.group_size == 0
            and x.shape[-1] // w.group_size <= _DIAG_MAX_GROUPS):
        out = _diag_gemv_xla(x.reshape(1, x.shape[-1]), w.q, w.s,
                             w.group_size)
        return out.reshape(*lead, w.q.shape[-1])
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    out = _quant_matmul_2d(
        x2, w.q, w.s, w.group_size, block_out=block_out, block_in=block_in,
        out_dtype=x.dtype, mode=mode or _DEFAULT_MODE,
    )
    return out.reshape(*lead, w.q.shape[-1])


# ---------------------------------------------------------------------------
# Layer-indexed variant: weights stay STACKED [L, in, out] in HBM and the
# kernel DMAs the requested layer's tiles directly. Inside a lax.scan over
# layers, slicing the stacked weight first (scan xs / dynamic_index) forces
# XLA to MATERIALIZE a copy of every layer's weights before each pallas_call
# (custom-call operands cannot fuse a dynamic-slice) — that one copy nearly
# doubles decode's HBM traffic, which is the whole tokens/s budget.


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_out", "block_in", "out_dtype", "mode"),
)
def _quant_matmul_layered(x, q, s, layer_idx, group_size: int,
                          block_out: int = 512, block_in: int = 4096,
                          out_dtype=None, mode: str = "fast"):
    """x [M, K] @ dequant(q [L, K, N], s [L, K/g, N])[layer_idx] -> [M, N].

    The stacked weight is viewed as 2-D [L*K, N] (a free reshape — the
    memory is contiguous) and the layer becomes a row offset in the
    BlockSpec index_map. The kernel body and block shapes are identical to
    the single-layer kernel; the tiles must divide K and N exactly (no pad
    fallback: padding a stacked weight copies gigabytes)."""
    M, K = x.shape
    L, K2, N = q.shape
    assert K == K2, (x.shape, q.shape)
    g = group_size
    out_dtype = out_dtype or x.dtype

    # TK quantum is srows_min*g: the scales block [TK//g, TN] needs >= 8
    # sublanes for fp32 scales, >= 16 for bf16 (Mosaic tiling rule). If
    # nothing divides, take the whole reduction in one tile; the 3-D scales
    # block then spans its full axis, which Mosaic allows at any size.
    srows_min = 16 if s.dtype.itemsize == 2 else 8
    TN = _pick_tile(N, 128, block_out)
    TK = _pick_tile(K, srows_min * g, block_in) or K
    assert TN is not None, (
        f"no dividing out-tile for N={N}; pad the checkpoint weights "
        "to a multiple of 128")
    n_n, n_k = N // TN, K // TK
    TM = _round_up(M, 8)
    if M != TM:
        x = jnp.pad(x, ((0, TM - M), (0, 0)))

    q2 = q.reshape(L * K, N)  # free: contiguous

    def kernel(idx_ref, x_ref, q_ref, s_ref, o_ref, acc_ref):
        # idx_ref is consumed by the index_maps; the body is the 2-D kernel
        # (scales arrive as a [1, TK//g, TN] block of the 3-D array)
        _kernel(x_ref, q_ref, s_ref.at[0], o_ref, acc_ref,
                group_size=g, n_k=n_k, mode=mode, k_axis=2)
    # TK == K: one scales block spanning the whole (8-padded) row axis.
    # Same sublane-alignment rule as the 2-D kernel; the pad below is a
    # per-call copy of the whole stacked scales array, so production MUST
    # pre-pad at load (params.to_device does) — this branch only rescues
    # ad-hoc callers (tests, notebooks) from a Mosaic compile error.
    if n_k == 1 and s.shape[1] % srows_min:
        s = jnp.pad(s, ((0, 0), (0, -s.shape[1] % srows_min), (0, 0)))
    SROWS = TK // g if n_k > 1 else s.shape[1]

    if (mode == "fast" and M == 1 and n_k == 1 and K % g == 0
            and K // g <= _DIAG_MAX_GROUPS):
        def kernel_d(idx_ref, a_ref, q_ref, s_ref, o_ref):
            _kernel_diag(a_ref, q_ref, s_ref.at[0], o_ref)

        a = _blockdiag(x, SROWS, g)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_n, 1),
            in_specs=[
                pl.BlockSpec((SROWS, TK), lambda j, k, idx: (0, 0)),
                pl.BlockSpec((TK, TN), lambda j, k, idx: (idx[0], j)),
                pl.BlockSpec((1, SROWS, TN), lambda j, k, idx: (idx[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda j, k, idx: (0, j)),
        )
        out = pl.pallas_call(
            kernel_d,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((TM, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * SROWS * K * N,
                bytes_accessed=SROWS * K * 2 + K * N + SROWS * N * 4
                + TM * N * 4,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(layer_idx.reshape(1).astype(jnp.int32), a, q2, s)
        return out[:M, :N]

    # M-grid: prefill feeds M = B*T in the thousands; cap the rows block
    # (decode GEMVs keep a single block)
    TMb = min(TM, _BLOCK_M)
    n_m = _cdiv(TM, TMb)
    if TM != n_m * TMb:
        x = jnp.pad(x, ((0, n_m * TMb - TM), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((TMb, TK), lambda m, j, k, idx: (m, k)),
            pl.BlockSpec((TK, TN),
                         lambda m, j, k, idx: (idx[0] * n_k + k, j)),
            pl.BlockSpec((1, SROWS, TN),
                         lambda m, j, k, idx: (idx[0], k, j)),
        ],
        out_specs=pl.BlockSpec((TMb, TN), lambda m, j, k, idx: (m, j)),
        scratch_shapes=[pltpu.VMEM((TMb, TN), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_m * TMb, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # this chip has 128 MB VMEM; the default 16 MB scoped budget
            # rejects whole-reduction tiles (w2 at K=11008 needs ~18 MB)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * TM * K * N,
            bytes_accessed=TM * K * 4 + n_m * K * N + (K // g) * N * 4
            + TM * N * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(layer_idx.reshape(1).astype(jnp.int32), x, q2, s)
    return out[:M, :N]


def _diag_gemv_xla(x2, q, s, g: int, layer_idx=None):
    """XLA block-diagonal GEMV: P = blockdiag(x) @ q as a PLAIN dot_general
    (the int8->bf16 cast and the dynamic layer slice both fuse into XLA's
    dot emitter, which streams int8 weights at ~814 GB/s on this chip —
    near spec, and faster than the hand-pipelined Mosaic kernel), then the
    group scales apply to the [ng, N] partials in fp32."""
    ngp = s.shape[-2]
    a = _blockdiag(x2, ngp, g)
    if layer_idx is not None:
        q = jax.lax.dynamic_index_in_dim(q, layer_idx, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(s, layer_idx, 0, keepdims=False)
    P = jax.lax.dot_general(
        a, q.astype(jnp.bfloat16), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = jnp.sum(P * s.astype(jnp.float32), axis=0, keepdims=True)
    return y.astype(x2.dtype)


def quant_matmul_layered(x, w: QuantArray, layer_idx, mode: str | None = None,
                         block_out: int | None = None,
                         block_in: int | None = None):
    """x [..., in] @ dequant(stacked QuantArray [L, in, out])[layer_idx].

    For use inside lax.scan over layers: pass the UNSLICED stacked weight;
    the kernel's index_map picks the layer, so no per-layer weight copy is
    materialized."""
    block_out = block_out or _BLOCK_OUT
    block_in = block_in or _BLOCK_IN
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w.q.shape[-1]
    x2 = x.reshape(-1, K)
    if (_XLA_DIAG
            and (mode or _DEFAULT_MODE) == "fast" and x2.shape[0] == 1
            and K % w.group_size == 0
            and K // w.group_size <= _DIAG_MAX_GROUPS):
        out = _diag_gemv_xla(x2, w.q, w.s, w.group_size, layer_idx)
        return out.reshape(*lead, N)
    if _pick_tile(N, 128, block_out) is None or \
            _pick_tile(K, w.group_size, block_in) is None:
        # odd (test-sized) shape: no dividing tile — slice the layer and
        # take the padding single-layer kernel (copies one layer; fine off
        # the production shapes, which all divide)
        wl_q = jax.lax.dynamic_index_in_dim(w.q, layer_idx, 0, keepdims=False)
        wl_s = jax.lax.dynamic_index_in_dim(w.s, layer_idx, 0, keepdims=False)
        out = _quant_matmul_2d(
            x2, wl_q, wl_s, w.group_size, block_out=block_out,
            block_in=block_in, out_dtype=x.dtype, mode=mode or _DEFAULT_MODE,
        )
    else:
        out = _quant_matmul_layered(
            x2, w.q, w.s, layer_idx, w.group_size, block_out=block_out,
            block_in=block_in, out_dtype=x.dtype, mode=mode or _DEFAULT_MODE,
        )
    return out.reshape(*lead, N)

"""Shape-keyed kernel-tuning defaults (the KT_* autotable).

Every KT_* env knob is PROCESS-START-ONLY (read at import or first trace
and baked into the jit cache). This module is the single place their
defaults live, each with the measurement that chose it; the env vars
remain as overrides for sweeps. VERDICT r4 #7 asked for exactly this:
sweep winners baked into shape-keyed defaults, no behavior change unless
a knob is set.

| knob            | default | chosen by                                   |
|-----------------|---------|---------------------------------------------|
| KT_BLOCK_OUT    | 512     | r3 tile sweep (tools/bench_kernels.py): TN  |
|                 |         | 512 fastest at 7B shapes; 1024 explodes     |
|                 |         | Mosaic compile on whole-reduction blocks    |
| KT_BLOCK_IN     | 4096    | r3: whole-reduction tiles ~2x faster than   |
|                 |         | TK=2048 at decode shapes                    |
| KT_DIAG_MAX     | 64      | r3 headline config; r4 A/B at 176 was       |
|                 |         | noise at TinyLlama, REGRESSED at 7B (r5:    |
|                 |         | 87.9 vs 92.4 same-day, /tmp sweep)          |
| KT_XLA_DIAG     | 1       | r4 interleaved A/B, 4/4 samples, +1.4% at   |
|                 |         | the 7B headline                             |
| KT_UNROLL       | 1       | r4: 4 won +3.6% at TinyLlama layered (now   |
|                 |         | megakernel) but regressed 7B to 90.6        |
| KT_FUSED_STEP   | auto    | megakernel on TPU when the VMEM plan fits   |
| KT_FUSED_CHUNK  | 0       | r4: ties the single-step megakernel, loses  |
|                 |         | at Llama-3.2-1B (ABLATION_r04.md section 6) |
| KT_FUSED_BIG    | 0       | r5: fully-tiled big-model megakernel at 7B  |
|                 |         | reaches 91.5 tok/s vs 99.1 for the layered  |
|                 |         | path at group=256 (ABLATION_r05.md)         |
| KT_GEMV_INT8    | auto    | r5 shape rule below                         |
| KT_BIG_TILE     | 9 MB    | r5: ~8 MB single-operand tiles stream at    |
|                 |         | 766-789 GB/s (tools/exp_int8.py); larger    |
|                 |         | plans measured flat (NP=30 vs 17 tie)       |
| KT_BIG_INT8     | 1       | r5: 789 vs 766 GB/s in the tile probe;     |
|                 |         | in-situ tie (91.5 vs 91.4)                  |
| KT_BIG_STAGGER  | 1       | r5: tie with 0 (91.2 vs 91.4 — run noise)   |
| KT_PREFILL_XLA_M| 256     | r5: longctx prefill MFU 25-30% -> 78.5%     |
|                 |         | (BENCH_MATRIX_r05 engine_paged_longctx)     |
| KT_DUS_WRITE    | 0       | r5: B=1 cache write via DUS REGRESSED the   |
|                 |         | 7B headline (96.4 vs 98.7) — the batched    |
|                 |         | scatter already lowers in place             |
| quant group     | 256     | r5 bench default (--group): 92.4 -> 99.1    |
|                 |         | tok/s at 7B; dppl gates at 128/256 pass     |
|                 |         | (checkpoints/tinychar_g256/)                |

Shape rule for int8-activation GEMVs (gemv_int8_auto): the in-kernel
block-diagonal GEMV's MXU pass costs ~ng x a plain GEMV's FLOPs. With
MANY group rows (ng >= 32 — e.g. group 64 at dim >= 2048) quantizing the
activation per group and contracting s8xs8 wins (TinyLlama g=64: 523 vs
511 tok/s); with few rows the dot already hides behind the DMA and the
quantize VPU work only adds cost (g=256: 527 vs 537). Crossover measured
at TinyLlama between ng=32 (int8 wins) and ng=8 (bf16 wins).
"""

from __future__ import annotations

import os as _os

_ENV = _os.environ.get("KT_GEMV_INT8")  # process-start-only override

# measured crossover: int8-activation GEMV wins at >= this many group rows
GEMV_INT8_MIN_GROUPS = 32


def gemv_int8_auto(ngp: int) -> bool:
    """Shape-keyed default for the megakernel GEMV activation dtype."""
    if _ENV is not None:
        return _ENV == "1"
    return ngp >= GEMV_INT8_MIN_GROUPS

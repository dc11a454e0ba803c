"""The emitted collective bill must equal the analytic one.

tools/scaling.py's projection charges exactly 2 psums/layer + 1 logits
all-gather per decode step; r2 only asserted this on paper. Here the sharded
decode step is compiled on the virtual 8-device mesh and the HLO's actual
collectives are counted (parallel/hlo.py)."""

import jax.numpy as jnp  # noqa: F401 (backend init via conftest)

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.params import random_params
from kuiperllama_tpu.parallel.hlo import collective_bill, decode_step_bill
from kuiperllama_tpu.parallel.mesh import make_mesh


def test_decode_step_collective_bill_matches_analytic():
    cfg = tiny_config("llama2", n_heads=8, n_kv_heads=4, dim=128,
                      hidden_dim=256, vocab_size=512, seq_len=64)
    mesh = make_mesh(dp=1, tp=4)
    params = random_params(cfg, seed=0)
    bill = decode_step_bill(cfg, mesh, params, batch=2, cache_len=32)
    em, an = bill["emitted"], bill["analytic"]

    ar = em.get("all-reduce", {"count": 0, "bytes": 0})
    ag = em.get("all-gather", {"count": 0, "bytes": 0})
    # the layer scan compiles its body once: the static all-reduce payload
    # equals one body's bill (2 x [B, 1, dim] fp32; XLA's combiner may merge
    # them into fewer ops, so bytes — not counts — are the contract)
    assert ar["bytes"] == an["all_reduce_bytes_per_body"], bill
    assert 1 <= ar["count"] <= 2, bill
    # exactly one logits all-gather, full [B, 1, vocab] fp32 result
    assert ag["count"] == 1, bill
    assert ag["bytes"] == an["all_gather_bytes"], bill
    # nothing else crosses the wire
    for op in ("reduce-scatter", "all-to-all", "collective-permute"):
        assert op not in em, bill


def test_dp_axis_adds_no_collectives():
    """Pure data parallelism is communication-free at decode (weights
    replicated, rows independent): dp>1 adds NO collective ops, and each
    device's payload shrinks to its B/dp local rows."""
    cfg = tiny_config("llama2", n_heads=8, n_kv_heads=4, dim=128,
                      hidden_dim=256, vocab_size=512, seq_len=64)
    params = random_params(cfg, seed=0)
    tp_bill = decode_step_bill(cfg, make_mesh(dp=1, tp=4), params,
                               batch=4, cache_len=32)["emitted"]
    dptp_bill = decode_step_bill(cfg, make_mesh(dp=2, tp=4), params,
                                 batch=4, cache_len=32)["emitted"]
    for op in ("all-reduce", "all-gather"):
        assert dptp_bill[op]["count"] == tp_bill[op]["count"], (
            tp_bill, dptp_bill)
        assert dptp_bill[op]["bytes"] * 2 == tp_bill[op]["bytes"], (
            tp_bill, dptp_bill)
    for op in ("reduce-scatter", "all-to-all", "collective-permute"):
        assert op not in dptp_bill, dptp_bill


def test_collective_bill_parser():
    txt = """
  %ar.1 = f32[2,1,128]{2,1,0} all-reduce(f32[2,1,128] %x), replica_groups={}
  %agd = f32[2,1,512]{2,1,0} all-gather(f32[2,1,128] %y), dimensions={2}
  %c = (f32[8]{0}, bf16[4]{0}) all-reduce-start(f32[8] %a, bf16[4] %b)
  %d = f32[8]{0} all-reduce-done(f32[8] %c)
"""
    bill = collective_bill(txt)
    assert bill["all-reduce"] == {"count": 2, "bytes": 2 * 128 * 4 + 40}
    assert bill["all-gather"] == {"count": 1, "bytes": 2 * 512 * 4}

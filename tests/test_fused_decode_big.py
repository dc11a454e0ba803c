"""Big-model decode megakernel (ops/pallas/fused_decode_big.py) vs the
layered oracle on a shrunken geometry that still exercises every tiled
phase (NQ=2 qkv tiles, wo row tile(s), NT FFN tiles, int8-activation and
bf16-activation GEMV modes). Runs under the Pallas interpreter on CPU;
compiled numerics are recorded by bench.py's selftest on hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.fuse import fuse_params
from kuiperllama_tpu.models import decoder
from kuiperllama_tpu.ops.pallas import fused_decode_big as big
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.quant import quantize_q80


def _mk(seed=5):
    # d=512 so the wo row-tile quantum (8 sublanes * g = 512) divides;
    # hidden=1024 tiles into NT=8 at the patched budget; QCOLS=768 -> NQ=2
    cfg = tiny_config("llama2", dim=512, n_heads=8, n_kv_heads=2,
                      hidden_dim=1024, vocab_size=1024, seq_len=64)
    params = to_device(random_params(cfg, seed=seed), dtype=jnp.bfloat16)
    qblocks = dict(params["blocks"])
    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        qblocks[name] = quantize_q80(params["blocks"][name], group_size=64)
    return cfg, fuse_params(dict(params, blocks=qblocks))


@pytest.fixture(autouse=True)
def _small_tile_budget(monkeypatch):
    # production budget (~9 MB) would hold the whole tiny model in one
    # tile; shrink it so the plan genuinely splits into multiple phases
    monkeypatch.setattr(big, "_TILE_BUDGET", 300_000)
    yield


def test_plan_splits_into_phases():
    cfg, params = _mk()
    plan = big.plan_big(params["blocks"], jnp.bfloat16, 32)
    assert plan is not None
    assert plan["NQ"] >= 2, plan
    assert plan["NT"] >= 4, plan


def test_plan_rejects_dense():
    cfg = tiny_config("llama2", dim=512, n_heads=8, n_kv_heads=2,
                      hidden_dim=1024, vocab_size=1024, seq_len=64)
    params = fuse_params(
        to_device(random_params(cfg, seed=1), dtype=jnp.bfloat16))
    assert big.plan_big(params["blocks"], jnp.bfloat16, 32) is None


@pytest.mark.parametrize("int8_a", [False, True])
def test_big_step_matches_decode_step(int8_a):
    cfg, params = _mk()
    A = 32
    cache = decoder.init_kv_cache(cfg, batch=1, max_len=A,
                                  dtype=jnp.bfloat16)
    tokens = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    last, cache = decoder.prefill(cfg, params, tokens, cache)
    token = jnp.argmax(last, -1).astype(jnp.int32)
    pos = jnp.asarray([5], jnp.int32)

    want_logits, want_cache = decoder.decode_step(
        cfg, params, token, pos, jax.tree.map(jnp.copy, cache))

    L, _, _, KH, hd = cache["k"].shape
    x0 = params["tok_emb"][token]
    kc = cache["k"].reshape(L, A, KH * hd)
    vc = cache["v"].reshape(L, A, KH * hd)
    sin, cos = decoder.build_rope(cfg)
    x_fin, kc, vc = big.fused_decode_step_big(
        cfg, params, x0, kc, vc, pos[0], sin, cos, int8_a=int8_a)
    from kuiperllama_tpu.ops.linear import linear

    got_logits = linear(x_fin, params["lm_head"]).astype(jnp.float32)

    w = np.asarray(want_logits)
    g = np.asarray(got_logits)
    denom = max(np.abs(w).max(), 1e-6)
    # int8 activations add ~0.4%-class rounding on top of the bf16 path
    tol = 0.06 if int8_a else 0.05
    assert np.abs(g - w).max() / denom < tol, np.abs(g - w).max() / denom
    assert int(np.argmax(g)) == int(np.argmax(w))

    # the new token's K/V row must land in the cache at pos
    kw = np.asarray(want_cache["k"])
    kg = np.asarray(kc).reshape(L, 1, A, KH, hd)
    np.testing.assert_allclose(kg[:, :, :6], kw[:, :, :6], rtol=0, atol=0.05)


def test_big_multi_step_teacher_forced():
    """Several consecutive big-kernel steps, TEACHER-FORCED on the oracle's
    greedy tokens: each step's logits must stay within int8-activation
    rounding of the oracle's. This validates the cache threading across
    steps (each step attends over rows the previous big-kernel steps
    wrote) without the chaotic argmax divergence a random tiny model's
    near-tied logits produce under any rounding difference."""
    cfg, params = _mk(seed=9)
    A = 32
    from kuiperllama_tpu.ops.linear import linear

    L = cfg.n_layers
    KH, hd = cfg.n_kv_heads, cfg.head_dim
    sin, cos = decoder.build_rope(cfg)

    cache_w = decoder.init_kv_cache(cfg, batch=1, max_len=A,
                                    dtype=jnp.bfloat16)
    tokens = jnp.asarray([[3, 1, 4]], jnp.int32)
    last, cache_w = decoder.prefill(cfg, params, tokens, cache_w)
    token = jnp.argmax(last, -1).astype(jnp.int32)
    cache_g = jax.tree.map(jnp.copy, cache_w)
    pos = 3
    for _ in range(6):
        want, cache_w = decoder.decode_step(
            cfg, params, token, jnp.asarray([pos], jnp.int32), cache_w)
        kc = cache_g["k"].reshape(L, A, KH * hd)
        vc = cache_g["v"].reshape(L, A, KH * hd)
        x0 = params["tok_emb"][token]
        x_fin, kc, vc = big.fused_decode_step_big(
            cfg, params, x0, kc, vc, jnp.int32(pos), sin, cos, int8_a=True)
        got = linear(x_fin, params["lm_head"]).astype(jnp.float32)
        cache_g = dict(k=kc.reshape(L, 1, A, KH, hd),
                       v=vc.reshape(L, 1, A, KH, hd))
        w = np.asarray(want)
        g = np.asarray(got).reshape(w.shape)
        rel = np.abs(g - w).max() / max(np.abs(w).max(), 1e-6)
        assert rel < 0.06, (pos, rel)
        token = jnp.argmax(want, -1).astype(jnp.int32)  # teacher forcing
        pos += 1

"""Tensor/data-parallel correctness on a virtual 8-device CPU mesh
(SURVEY.md §4: the TPU answer to testing multi-node without a cluster).

Gate: sharded forward == single-device forward, bit-for-bit up to fp32
reassociation, for tp in {2, 4} x dp in {1, 2}, fp32 and int8 weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.models import decoder
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.parallel.mesh import make_mesh
from kuiperllama_tpu.parallel.sharded import ShardedForward
from kuiperllama_tpu.parallel.shardings import shard_params
from kuiperllama_tpu.quant import quantize_q80
from kuiperllama_tpu.ops.linear import set_use_pallas


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(True)


def _quantize_tree(params):
    out = dict(params)
    out["blocks"] = dict(params["blocks"])
    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        w = jnp.asarray(params["blocks"][name])
        out["blocks"][name] = quantize_q80(w, 32)
    return out


@pytest.mark.parametrize("dp,tp", [(1, 2), (1, 4), (2, 2), (2, 4)])
@pytest.mark.parametrize("quant", [False, True], ids=["fp32", "int8"])
def test_sharded_matches_single(dp, tp, quant):
    cfg = tiny_config("llama2", n_heads=8, n_kv_heads=4, dim=128,
                      hidden_dim=128, vocab_size=256, seq_len=64)
    params_np = random_params(cfg, seed=0)
    params = to_device(params_np, dtype=jnp.float32)
    if quant:
        params = _quantize_tree(params)

    B, T = 2 * dp, 6
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T), np.int32))
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    cache = decoder.init_kv_cache(cfg, batch=B, max_len=32)
    ref_logits, ref_cache = decoder.forward(cfg, params, tokens, positions, cache)

    mesh = make_mesh(dp=dp, tp=tp)
    sharded = ShardedForward(cfg, mesh, params)
    sp = shard_params(params, mesh, cfg)
    scache = sharded.init_cache(batch=B, max_len=32)
    logits, new_cache = sharded(cfg, sp, tokens, positions, scache)

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_cache["k"]), np.asarray(ref_cache["k"]),
        atol=1e-5, rtol=1e-5,
    )


def test_sharded_decode_steps():
    cfg = tiny_config("llama2", n_heads=8, n_kv_heads=4, dim=128,
                      hidden_dim=128, vocab_size=256, seq_len=64)
    params = to_device(random_params(cfg, seed=1), dtype=jnp.float32)
    mesh = make_mesh(dp=2, tp=4)
    sharded = ShardedForward(cfg, mesh, params)
    sp = shard_params(params, mesh, cfg)

    B = 2
    tokens = jnp.asarray([[3, 7, 11, 2], [9, 1, 4, 8]], jnp.int32)
    cache = decoder.init_kv_cache(cfg, batch=B, max_len=32)
    scache = sharded.init_cache(batch=B, max_len=32)

    ref_last, ref_cache = decoder.prefill(cfg, params, tokens, cache)
    sh_last, scache = decoder.prefill(cfg, sp, tokens, scache, forward_fn=sharded)
    np.testing.assert_allclose(np.asarray(sh_last), np.asarray(ref_last),
                               atol=2e-4, rtol=1e-4)

    tok = jnp.asarray([5, 6], jnp.int32)
    pos = jnp.asarray([4, 4], jnp.int32)
    for step in range(3):
        ref_logits, ref_cache = decoder.decode_step(cfg, params, tok, pos, kv_cache=ref_cache)
        sh_logits, scache = decoder.decode_step(cfg, sp, tok, pos, kv_cache=scache,
                                                forward_fn=sharded)
        np.testing.assert_allclose(np.asarray(sh_logits), np.asarray(ref_logits),
                                   atol=2e-4, rtol=1e-4, err_msg=f"step {step}")
        tok = jnp.argmax(sh_logits, -1).astype(jnp.int32)
        pos = pos + 1


@pytest.mark.parametrize("quant", [False, True], ids=["fp32", "int8"])
def test_fused_after_sharding_matches_single(quant):
    """TP + weight fusion together (round 1 rejected fused trees from TP):
    shard first, fuse per shard, logits must match the unfused single-device
    forward."""
    from kuiperllama_tpu.fuse import fuse_params_sharded

    cfg = tiny_config("llama2", n_heads=8, n_kv_heads=4, dim=128,
                      hidden_dim=128, vocab_size=256, seq_len=64)
    params = to_device(random_params(cfg, seed=3), dtype=jnp.float32)
    if quant:
        params = _quantize_tree(params)

    B, T = 2, 5
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T), np.int32))
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    cache = decoder.init_kv_cache(cfg, batch=B, max_len=32)
    ref_logits, _ = decoder.forward(cfg, params, tokens, positions, cache)

    mesh = make_mesh(dp=1, tp=4)
    sp = shard_params(params, mesh, cfg)
    fused = fuse_params_sharded(sp, mesh)
    assert "wqkv" in fused["blocks"] and "wq" not in fused["blocks"]
    sharded = ShardedForward(cfg, mesh, fused)
    scache = sharded.init_cache(batch=B, max_len=32)
    logits, _ = sharded(cfg, fused, tokens, positions, scache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=1e-4)


def test_sharded_generator_matches_single():
    from kuiperllama_tpu.serving.generate import Generator

    cfg = tiny_config("llama2", n_heads=8, n_kv_heads=4, dim=128,
                      hidden_dim=128, vocab_size=256, seq_len=64)
    params = to_device(random_params(cfg, seed=2), dtype=jnp.float32)
    gen1 = Generator(cfg, params, cache_len=64)
    want, _, _ = gen1.generate_ids([3, 9, 1], max_new_tokens=10)

    mesh = make_mesh(dp=1, tp=4)
    sharded = ShardedForward(cfg, mesh, params)
    sp = shard_params(params, mesh, cfg)
    gen2 = Generator(cfg, sp, cache_len=64, forward_fn=sharded)
    got, _, _ = gen2.generate_ids([3, 9, 1], max_new_tokens=10)
    assert got == want

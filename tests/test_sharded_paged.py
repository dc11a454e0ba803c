"""Tensor-sharded paged serving vs the single-device paged engine (greedy
outputs must be bit-identical on the virtual 8-device CPU mesh; this is the
BASELINE configs[3] path — paged KV + continuous batching under TP)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.parallel.mesh import make_mesh
from kuiperllama_tpu.serving.engine import PagedEngine, Request
from kuiperllama_tpu.ops.linear import set_use_pallas


@pytest.fixture(autouse=True)
def _xla_path():
    set_use_pallas(False)
    yield
    set_use_pallas(True)


@pytest.fixture(scope="module")
def model():
    # n_kv_heads=2 divides tp=2; vocab 512 % 2 == 0
    cfg = tiny_config("llama2", seq_len=64)
    params = to_device(random_params(cfg, seed=21), dtype=jnp.float32)
    return cfg, params


PROMPTS = [[1, 5, 9], [2, 3], [7, 7, 7, 7], [4, 11]]


def _run(engine):
    reqs = [Request(prompt_ids=p, max_new_tokens=9) for p in PROMPTS]
    done = engine.run(reqs)
    return sorted((tuple(r.prompt_ids), tuple(r.out_ids)) for r in done)


def test_sharded_paged_matches_single_device(model):
    cfg, params = model
    single = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                         cache_dtype=jnp.float32, page_size=128)
    want = _run(single)

    mesh = make_mesh(dp=1, tp=2)
    sharded = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                          cache_dtype=jnp.float32, page_size=128, mesh=mesh)
    got = _run(sharded)
    assert got == want

    # pages actually live sharded over the model axis
    sh = sharded.k_pages.sharding
    assert sh.spec[-1] == "model"


def test_sharded_paged_quantized(model):
    """INT8 weights under TP on the paged path (the BASELINE configs[3]
    combination): sharded quantized output == single-device quantized."""
    from kuiperllama_tpu.quant import quantize_q80

    cfg, params = model
    qblocks = dict(params["blocks"])
    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        qblocks[name] = quantize_q80(params["blocks"][name], group_size=32)
    qparams = dict(params, blocks=qblocks)

    single = PagedEngine(cfg, qparams, max_batch=2, max_len=64, chunk=4,
                         cache_dtype=jnp.float32, page_size=128)
    want = _run(single)
    mesh = make_mesh(dp=1, tp=2)
    sharded = PagedEngine(cfg, qparams, max_batch=2, max_len=64, chunk=4,
                          cache_dtype=jnp.float32, page_size=128, mesh=mesh)
    got = _run(sharded)
    assert got == want


def test_sharded_paged_qwen2_bias_fused():
    """Qwen2 qkv biases through the per-shard fused bqkv path under TP:
    sharded quantized+fused engine output == single-device (BASELINE
    configs[1] family coverage; bias layout per qwen2.cpp:307-332)."""
    from kuiperllama_tpu.quant import quantize_q80

    cfg = tiny_config("qwen2", seq_len=64)
    assert cfg.qkv_bias
    params = to_device(random_params(cfg, seed=31), dtype=jnp.float32)
    qblocks = dict(params["blocks"])
    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        qblocks[name] = quantize_q80(params["blocks"][name], group_size=32)
    qparams = dict(params, blocks=qblocks)

    single = PagedEngine(cfg, qparams, max_batch=2, max_len=64, chunk=4,
                         cache_dtype=jnp.float32, page_size=128)
    want = _run(single)
    mesh = make_mesh(dp=1, tp=2)
    sharded = PagedEngine(cfg, qparams, max_batch=2, max_len=64, chunk=4,
                          cache_dtype=jnp.float32, page_size=128, mesh=mesh)
    got = _run(sharded)
    assert got == want

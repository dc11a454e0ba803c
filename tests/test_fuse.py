"""Fused qkv / gate-up projections must be numerically identical."""

import numpy as np
import jax.numpy as jnp
import pytest

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.fuse import fuse_params
from kuiperllama_tpu.models import decoder
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.quant import quantize_q80
from kuiperllama_tpu.ops.linear import set_use_pallas


@pytest.fixture(autouse=True)
def _xla_path():
    set_use_pallas(False)
    yield
    set_use_pallas(True)


@pytest.mark.parametrize("family", ["llama2", "qwen2"])
@pytest.mark.parametrize("quant", [False, True], ids=["fp32", "int8"])
def test_fused_forward_matches(family, quant):
    cfg = tiny_config(family, seq_len=64)
    params = to_device(random_params(cfg, seed=3), dtype=jnp.float32)
    if quant:
        for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
            params["blocks"][name] = quantize_q80(params["blocks"][name], 32)
    fused = fuse_params(params)
    assert "wqkv" in fused["blocks"] and "wq" not in fused["blocks"]

    tokens = jnp.asarray([[1, 7, 3, 9]], jnp.int32)
    positions = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    c1 = decoder.init_kv_cache(cfg, 1, 32)
    c2 = decoder.init_kv_cache(cfg, 1, 32)
    l1, cc1 = decoder.forward(cfg, params, tokens, positions, c1)
    l2, cc2 = decoder.forward(cfg, fused, tokens, positions, c2)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cc1["k"]), np.asarray(cc2["k"]))


def test_fused_paged_matches_dense_engine():
    from kuiperllama_tpu.serving.engine import Engine, PagedEngine, Request

    cfg = tiny_config("llama2", seq_len=64)
    params = to_device(random_params(cfg, seed=4), dtype=jnp.float32)
    dense = Engine(cfg, params, max_batch=2, max_len=64, chunk=4,
                   cache_dtype=jnp.float32)
    paged = PagedEngine(cfg, fuse_params(params), max_batch=2, max_len=64,
                        chunk=4, cache_dtype=jnp.float32)
    prompts = [[1, 5, 9], [2, 3]]
    want = dense.run([Request(prompt_ids=p, max_new_tokens=8) for p in prompts])
    got = paged.run([Request(prompt_ids=p, max_new_tokens=8) for p in prompts])
    w = sorted((tuple(r.prompt_ids), tuple(r.out_ids)) for r in want)
    g = sorted((tuple(r.prompt_ids), tuple(r.out_ids)) for r in got)
    assert g == w

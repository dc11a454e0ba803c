"""Perplexity eval + INT8 quantization gate (BASELINE.md: Δppl <= 0.1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kuiperllama_tpu.checkpoint.binfmt import load_bin, write_v0, write_v3
from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.evaluate import perplexity, quantization_ppl_delta
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.ops.linear import set_use_pallas


@pytest.fixture(autouse=True)
def _xla_path():
    set_use_pallas(False)
    yield
    set_use_pallas(True)


def test_ppl_uniform_model_near_vocab():
    # a zeroed model emits uniform logits -> ppl == vocab_size
    cfg = tiny_config("llama2", seq_len=64)
    params = random_params(cfg, seed=0, scale=0.0)
    params["tok_emb"] += 0.001  # break symmetry w/o information
    params = to_device(params, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    stream = rng.integers(0, cfg.vocab_size, 128).astype(np.int32)
    ppl = perplexity(cfg, params, stream, window=32)
    assert abs(ppl - cfg.vocab_size) / cfg.vocab_size < 0.05, ppl


def test_int8_ppl_gate(tmp_path):
    cfg = tiny_config("llama2", seq_len=64)
    params = random_params(cfg, seed=5)
    p0, p3 = str(tmp_path / "m.bin"), str(tmp_path / "m.q8.bin")
    write_v0(p0, cfg, params)
    write_v3(p3, cfg, params)
    cfg0, fp = load_bin(p0)
    cfg3, q8 = load_bin(p3, quantized=True)
    rng = np.random.default_rng(2)
    stream = rng.integers(0, cfg.vocab_size, 256).astype(np.int32)
    report = quantization_ppl_delta(
        cfg0, to_device(fp, dtype=jnp.float32),
        cfg3, to_device(q8, dtype=jnp.float32),
        stream, window=64,
    )
    assert report["passes_gate"], report
    assert report["ppl_fp"] > 1.0

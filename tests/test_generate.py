"""End-to-end generation smoke tests: .bin checkpoint -> Generator -> text.

Greedy determinism and quant-vs-fp closeness are the gates (reference does
this manually by diffing CLI output vs hf_infer; SURVEY.md §4 says automate)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kuiperllama_tpu.checkpoint.binfmt import load_bin, write_v0, write_v3
from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.serving.generate import Generator
from kuiperllama_tpu.ops.linear import set_use_pallas


@pytest.fixture(autouse=True)
def _xla_quant_path():
    # CPU tests exercise the XLA oracle path; Pallas is tested separately.
    set_use_pallas(False)
    yield
    set_use_pallas(True)


def _fixture(tmp_path, version):
    cfg = tiny_config("llama2", seq_len=64)
    params = random_params(cfg, seed=11)
    path = str(tmp_path / f"m{version}.bin")
    (write_v0 if version == 0 else write_v3)(path, cfg, params)
    return path


def test_greedy_deterministic(tmp_path):
    path = _fixture(tmp_path, 0)
    cfg, params = load_bin(path)
    gen = Generator(cfg, to_device(params), cache_len=64)
    ids1, _, _ = gen.generate_ids([1, 5, 9], max_new_tokens=12)
    ids2, _, _ = gen.generate_ids([1, 5, 9], max_new_tokens=12)
    assert ids1 == ids2
    assert len(ids1) == 12
    assert all(0 <= t < cfg.vocab_size for t in ids1)


def test_quant_generation_close_to_fp32(tmp_path):
    p0 = _fixture(tmp_path, 0)
    p3 = _fixture(tmp_path, 3)
    cfg0, params0 = load_bin(p0)
    cfg3, params3 = load_bin(p3, quantized=True)
    g0 = Generator(cfg0, to_device(params0), cache_len=64)
    g3 = Generator(cfg3, to_device(params3), cache_len=64)
    ids0, _, _ = g0.generate_ids([1, 5, 9], max_new_tokens=8)
    ids3, _, _ = g3.generate_ids([1, 5, 9], max_new_tokens=8)
    # random weights -> near-uniform logits, so token-level agreement isn't
    # guaranteed; instead gate on logit closeness of the first step
    from kuiperllama_tpu.models import decoder

    tokens = jnp.asarray([[1, 5, 9]], jnp.int32)
    cache0 = decoder.init_kv_cache(cfg0, 1, 64)
    cache3 = decoder.init_kv_cache(cfg3, 1, 64)
    l0, _ = decoder.prefill(cfg0, to_device(params0), tokens, cache0)
    l3, _ = decoder.prefill(cfg3, to_device(params3), tokens, cache3)
    diff = np.abs(np.asarray(l0) - np.asarray(l3)).max()
    assert diff < 0.05, diff


def test_sampling_with_temperature(tmp_path):
    path = _fixture(tmp_path, 0)
    cfg, params = load_bin(path)
    gen = Generator(cfg, to_device(params), cache_len=64)
    ids_a, _, _ = gen.generate_ids([2, 3], max_new_tokens=8,
                                   temperature=1.0, top_k=50, seed=1)
    ids_b, _, _ = gen.generate_ids([2, 3], max_new_tokens=8,
                                   temperature=1.0, top_k=50, seed=1)
    ids_c, _, _ = gen.generate_ids([2, 3], max_new_tokens=8,
                                   temperature=1.0, top_k=50, seed=2)
    assert ids_a == ids_b  # same seed reproduces
    assert len(ids_c) == 8

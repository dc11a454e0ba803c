"""Checkpoint format round-trip tests (reference export.py v0/v3 layouts,
mirroring test/test_op/test_load.cpp's fixture strategy with our own writer
as the fixture generator)."""

import numpy as np
import pytest

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.checkpoint.binfmt import load_bin, write_v0, write_v3
from kuiperllama_tpu.params import random_params


@pytest.mark.parametrize("family", ["llama2", "qwen2"])
@pytest.mark.parametrize("tied", [False, True])
def test_v0_roundtrip(tmp_path, family, tied):
    cfg = tiny_config(family, tied_embedding=tied)
    params = random_params(cfg, seed=1)
    path = str(tmp_path / "m.bin")
    write_v0(path, cfg, params)
    cfg2, loaded = load_bin(path, family=family)
    assert cfg2.dim == cfg.dim and cfg2.tied_embedding == tied
    assert cfg2.n_kv_heads == cfg.n_kv_heads and cfg2.seq_len == cfg.seq_len
    for key in ("tok_emb", "final_norm", "lm_head"):
        np.testing.assert_allclose(loaded[key], params[key], rtol=1e-6)
    for key in params["blocks"]:
        np.testing.assert_allclose(
            loaded["blocks"][key], params["blocks"][key], rtol=1e-6, err_msg=key
        )


@pytest.mark.parametrize("tied", [False, True])
def test_v3_roundtrip_quant(tmp_path, tied):
    cfg = tiny_config("llama2", tied_embedding=tied)
    params = random_params(cfg, seed=2)
    path = str(tmp_path / "m.q8.bin")
    err = write_v3(path, cfg, params, group_size=64)
    assert err < 0.02
    cfg2, loaded = load_bin(path, family="llama2", quantized=True)
    assert cfg2.group_size == 64
    # fp32 tensors exact
    np.testing.assert_allclose(loaded["tok_emb"], params["tok_emb"], rtol=1e-6)
    # quant tensors close after dequant
    wq = loaded["blocks"]["wq"]
    assert wq["q"].dtype == np.int8
    g = wq["group_size"]
    sg = np.repeat(wq["s"], g, axis=1)
    deq = wq["q"].astype(np.float32) * sg
    np.testing.assert_allclose(deq, params["blocks"]["wq"], atol=0.02)
    if tied:
        np.testing.assert_allclose(
            loaded["lm_head"], params["tok_emb"].T, rtol=1e-6
        )


def test_v3_autodetect(tmp_path):
    cfg = tiny_config("llama2")
    params = random_params(cfg, seed=3)
    p0, p3 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    write_v0(p0, cfg, params)
    write_v3(p3, cfg, params)
    cfg0, _ = load_bin(p0, quantized=None)
    cfg3, _ = load_bin(p3, quantized=None)
    assert cfg0.group_size is None
    assert cfg3.group_size == 64


def test_v3_dequant_on_load(tmp_path):
    cfg = tiny_config("llama2")
    params = random_params(cfg, seed=4)
    path = str(tmp_path / "c.bin")
    write_v3(path, cfg, params)
    cfg2, loaded = load_bin(path, quantized=True, keep_quant=False)
    assert cfg2.group_size is None
    assert loaded["blocks"]["w2"].dtype == np.float32
    np.testing.assert_allclose(
        loaded["blocks"]["w2"], params["blocks"]["w2"], atol=0.02
    )

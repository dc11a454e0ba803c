"""Checkpoint format tests: writer round-trips PLUS hand-constructed byte
fixtures (reference test/test_op/test_load.cpp:11-108 strategy — a fixture
built independently of the reader under test, so a shared reader/writer
misunderstanding of the layout cannot pass)."""

import struct

import numpy as np
import pytest

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.checkpoint.binfmt import load_bin, write_v0, write_v3
from kuiperllama_tpu.errors import ModelParseError
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


# ---------------------------------------------------------------------------
# Writer-independent byte fixtures. Offsets hand-derived from the reference
# exporter (reference tools/export.py:96-131 for v0, 137-210 for v3;
# Qwen-bias flavor per kuiper/source/model/qwen2.cpp:307-332): every byte of
# the file is laid down with struct/np here, never via write_v0/write_v3.

# Tiny shape: dim=4, hidden=6, L=1, heads=2, kv_heads=1, vocab=5, seq=3,
# untied (header vocab = -5). head_dim=2, kv_dim=2.
_D, _HID, _L, _NH, _NKV, _V, _S = 4, 6, 1, 2, 1, 5, 3
_KV_DIM = 2


def _seq(n, start):
    """Identifiable fp32 payload: start, start+1, ..."""
    return np.arange(start, start + n, dtype=np.float32)


def _build_v0_bytes(qkv_bias: bool):
    """v0 body in reference order; returns (bytes, expected tensor dict in
    reference [out, in] orientation)."""
    out = [struct.pack("<7i", _D, _HID, _L, _NH, _NKV, -_V, _S)]
    exp = {}
    pos = 0

    def emit(name, shape):
        nonlocal pos
        n = int(np.prod(shape))
        a = _seq(n, pos).reshape(shape)
        pos += n
        out.append(a.tobytes())
        exp[name] = a

    emit("tok_emb", (_V, _D))
    emit("attn_norm", (_D,))
    emit("wq", (_D, _D))
    if qkv_bias:
        emit("bq", (_D,))
    emit("wk", (_KV_DIM, _D))
    if qkv_bias:
        emit("bk", (_KV_DIM,))
    emit("wv", (_KV_DIM, _D))
    if qkv_bias:
        emit("bv", (_KV_DIM,))
    emit("wo", (_D, _D))
    emit("ffn_norm", (_D,))
    emit("w1", (_HID, _D))
    emit("w2", (_D, _HID))
    emit("w3", (_HID, _D))
    emit("final_norm", (_D,))
    emit("freqs_cos", (_S, 1))  # head_dim//2 == 1
    emit("freqs_sin", (_S, 1))
    emit("wcls", (_V, _D))
    return b"".join(out), exp


@pytest.mark.parametrize("family", ["llama2", "qwen2"])
def test_v0_byte_fixture(tmp_path, family):
    qkv_bias = family == "qwen2"
    raw, exp = _build_v0_bytes(qkv_bias)
    path = str(tmp_path / "fix.bin")
    with open(path, "wb") as f:
        f.write(raw)
    cfg, params = load_bin(path, family=family)
    assert (cfg.dim, cfg.hidden_dim, cfg.n_layers) == (_D, _HID, _L)
    assert (cfg.n_heads, cfg.n_kv_heads, cfg.vocab_size, cfg.seq_len) == (
        _NH, _NKV, _V, _S)
    assert not cfg.tied_embedding
    b = params["blocks"]
    np.testing.assert_array_equal(params["tok_emb"], exp["tok_emb"])
    np.testing.assert_array_equal(params["final_norm"], exp["final_norm"])
    # loader returns [in, out]; fixture holds reference [out, in]
    np.testing.assert_array_equal(params["lm_head"], exp["wcls"].T)
    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        np.testing.assert_array_equal(b[name][0], exp[name].T, err_msg=name)
    for name in ("attn_norm", "ffn_norm"):
        np.testing.assert_array_equal(b[name][0], exp[name], err_msg=name)
    if qkv_bias:
        for name in ("bq", "bk", "bv"):
            np.testing.assert_array_equal(b[name][0], exp[name], err_msg=name)
    else:
        assert "bq" not in b


def test_v3_byte_fixture(tmp_path):
    """v3 layout: quantized {wq,wk,wv,wo,w1,w2,w3,wcls} each int8 payload
    immediately followed by its fp32 group scales, then fp32 emb + norms."""
    g = 2
    out = [struct.pack("<8i", _D, _HID, _L, _NH, _NKV, -_V, _S, g)]
    exp_q, exp_s = {}, {}
    qpos, spos, fpos = 0, 0, 1000

    def emit_q(name, o, i):
        nonlocal qpos, spos
        q = ((np.arange(qpos, qpos + o * i) % 251) - 125).astype(np.int8)
        qpos += o * i
        s = _seq(o * i // g, spos) / 100.0 + 0.5
        spos += o * i // g
        out.append(q.tobytes())
        out.append(s.astype(np.float32).tobytes())
        exp_q[name] = q.reshape(o, i)
        exp_s[name] = s.astype(np.float32).reshape(o, i // g)

    fp = {}

    def emit_fp(name, shape):
        nonlocal fpos
        n = int(np.prod(shape))
        a = _seq(n, fpos).reshape(shape)
        fpos += n
        out.append(a.tobytes())
        fp[name] = a

    for name, (o, i) in (
        ("wq", (_D, _D)), ("wk", (_KV_DIM, _D)), ("wv", (_KV_DIM, _D)),
        ("wo", (_D, _D)), ("w1", (_HID, _D)), ("w2", (_D, _HID)),
        ("w3", (_HID, _D)), ("wcls", (_V, _D)),
    ):
        emit_q(name, o, i)
    emit_fp("tok_emb", (_V, _D))
    emit_fp("attn_norm", (_D,))
    emit_fp("ffn_norm", (_D,))
    emit_fp("final_norm", (_D,))

    path = str(tmp_path / "fix.q8.bin")
    with open(path, "wb") as f:
        f.write(b"".join(out))
    cfg, params = load_bin(path, family="llama2", quantized=True)
    assert cfg.group_size == g
    b = params["blocks"]
    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        np.testing.assert_array_equal(b[name]["q"][0], exp_q[name].T,
                                      err_msg=name)
        np.testing.assert_array_equal(b[name]["s"][0], exp_s[name].T,
                                      err_msg=name)
    np.testing.assert_array_equal(params["lm_head"]["q"], exp_q["wcls"].T)
    np.testing.assert_array_equal(params["tok_emb"], fp["tok_emb"])
    np.testing.assert_array_equal(b["attn_norm"][0], fp["attn_norm"])
    np.testing.assert_array_equal(params["final_norm"], fp["final_norm"])
    # autodetect must also pick v3 for this file
    cfg2, _ = load_bin(path, family="llama2", quantized=None)
    assert cfg2.group_size == g


def test_malformed_files_raise_model_parse_error(tmp_path):
    # too short for any header
    short = tmp_path / "short.bin"
    short.write_bytes(b"\x01\x02\x03")
    with pytest.raises(ModelParseError):
        load_bin(str(short))
    # nonsense header fields
    junk = tmp_path / "junk.bin"
    junk.write_bytes(struct.pack("<8i", 0, -3, 9, 2, 4, 5, -1, 7) + b"x" * 64)
    with pytest.raises(ModelParseError):
        load_bin(str(junk))
    # plausible header but truncated body
    raw, _ = _build_v0_bytes(qkv_bias=False)
    trunc = tmp_path / "trunc.bin"
    trunc.write_bytes(raw[:-4])
    with pytest.raises(ModelParseError):
        load_bin(str(trunc), family="llama2")
    # reference's own synthetic fixture (huge header dims, 8KB body) must
    # fail cleanly, not via a bare AssertionError
    import os
    ref = "/root/reference/tmp/test.bin"
    if os.path.exists(ref):
        with pytest.raises(ModelParseError):
            load_bin(ref)


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


def test_v3_bias_roundtrip_qwen2(tmp_path):
    """Our v3 Qwen2 extension: quant weights + fp32 qkv biases round-trip,
    and the bias flavor is autodetected by exact body size (the reference's
    quant loader has no bias support — qwen2.cpp:184-288)."""
    cfg = tiny_config("qwen2", tied_embedding=False)
    assert cfg.qkv_bias
    params = random_params(cfg, seed=5)
    path = str(tmp_path / "q.q8.bin")
    err = write_v3(path, cfg, params, group_size=64)
    assert err < 0.02
    cfg2, loaded = load_bin(path, family="qwen2", quantized=None)  # autodetect
    assert cfg2.group_size == 64 and cfg2.qkv_bias
    for key in ("bq", "bk", "bv"):
        np.testing.assert_allclose(
            loaded["blocks"][key], params["blocks"][key], rtol=1e-6,
            err_msg=key)
    wv = loaded["blocks"]["wv"]
    sg = np.repeat(wv["s"], wv["group_size"], axis=1)
    deq = wv["q"].astype(np.float32) * sg
    np.testing.assert_allclose(deq, params["blocks"]["wv"], atol=0.02)
    # a biasless parse of the same file must fail the size check
    with pytest.raises(ModelParseError):
        load_bin(path, family="qwen2", quantized=True, qkv_bias=False)


def test_v3_roundtrip_group256(tmp_path):
    """v3 carries the group size in its header; a group-256 export (the r5
    bench default — tools/export.py --group 256) round-trips and generates
    identically to the in-memory quantization."""
    cfg = tiny_config("llama2", dim=256, n_heads=4, n_kv_heads=2,
                      hidden_dim=512, vocab_size=256, seq_len=64)
    params = random_params(cfg, seed=3)
    path = str(tmp_path / "m.q8g256.bin")
    err = write_v3(path, cfg, params, group_size=256)
    assert err < 0.02
    cfg2, loaded = load_bin(path, family="llama2", quantized=True)
    assert cfg2.group_size == 256
    wq = loaded["blocks"]["wq"]
    assert wq["group_size"] == 256
    sg = np.repeat(wq["s"], 256, axis=1)
    deq = wq["q"].astype(np.float32) * sg
    np.testing.assert_allclose(deq, params["blocks"]["wq"], atol=0.02)

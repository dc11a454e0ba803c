"""Decode megakernel (ops/pallas/fused_decode.py) vs the layered oracle:
same greedy tokens and close logits on tiny bf16 models, quantized and
dense, llama2 (interleaved rope) and qwen2 (half rope + qkv bias).
Runs under the Pallas interpreter on CPU; the compiled kernel's numerics
are recorded by bench.py's selftest on hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.fuse import fuse_params
from kuiperllama_tpu.models import decoder
from kuiperllama_tpu.ops.pallas.fused_decode import fused_decode_step, rope_matrix
from kuiperllama_tpu.ops.rope import apply_rope, rope_cache
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.quant import quantize_q80
from kuiperllama_tpu.serving.generate import Generator


def _mk_params(cfg, quant, seed=5):
    params = to_device(random_params(cfg, seed=seed), dtype=jnp.bfloat16)
    if quant:
        qblocks = dict(params["blocks"])
        for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
            qblocks[name] = quantize_q80(params["blocks"][name],
                                         group_size=32)
        params = dict(params, blocks=qblocks)
    return fuse_params(params)


@pytest.mark.parametrize("family,quant", [
    ("llama2", False), ("llama2", True), ("qwen2", False), ("qwen2", True),
])
def test_fused_step_matches_decode_step(family, quant):
    cfg = tiny_config(family, seq_len=64)
    params = _mk_params(cfg, quant)
    A = 32
    cache = decoder.init_kv_cache(cfg, batch=1, max_len=A,
                                  dtype=jnp.bfloat16)

    # prefill a short context through the ORACLE so both paths start from
    # the same cache state
    tokens = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    last, cache = decoder.prefill(cfg, params, tokens, cache)
    token = jnp.argmax(last, -1).astype(jnp.int32)
    pos = jnp.asarray([5], jnp.int32)

    want_logits, want_cache = decoder.decode_step(cfg, params, token, pos,
                                                  jax.tree.map(jnp.copy, cache))

    L, _, _, KH, hd = cache["k"].shape
    x0 = params["tok_emb"][token]
    kc = cache["k"].reshape(L, A, KH * hd)
    vc = cache["v"].reshape(L, A, KH * hd)
    sin, cos = decoder.build_rope(cfg)
    x_fin, kc, vc = fused_decode_step(cfg, params, x0, kc, vc, pos[0],
                                      sin, cos)
    from kuiperllama_tpu.ops.linear import linear

    got_logits = linear(x_fin, params["lm_head"]).astype(jnp.float32)

    w = np.asarray(want_logits)
    g = np.asarray(got_logits)
    # bf16 path: small per-op rounding-order differences accumulate
    denom = max(np.abs(w).max(), 1e-6)
    assert np.abs(g - w).max() / denom < 0.05, np.abs(g - w).max() / denom
    assert int(np.argmax(g)) == int(np.argmax(w))

    # the new token's K/V row must land in the cache at pos
    kw = np.asarray(want_cache["k"])  # [L, 1, A, KH, hd]
    kg = np.asarray(kc).reshape(L, 1, A, KH, hd)
    np.testing.assert_allclose(kg[:, :, :6], kw[:, :, :6], rtol=0, atol=0.05)


@pytest.mark.parametrize("quant", [False, True])
def test_fused_generation_matches_unfused(quant):
    """End-to-end greedy generation: fused Generator == unfused Generator."""
    cfg = tiny_config("llama2", seq_len=64)
    params = _mk_params(cfg, quant)
    prompt = [1, 7, 3, 2]
    base = Generator(cfg, params, cache_len=64, cache_dtype=jnp.bfloat16,
                     fused_step=False)
    want, *_ = base.generate_ids(prompt, max_new_tokens=12)
    fast = Generator(cfg, params, cache_len=64, cache_dtype=jnp.bfloat16,
                     fused_step=True)
    got, *_ = fast.generate_ids(prompt, max_new_tokens=12)
    assert got == want, (got, want)


def test_rope_matrix_matches_apply_rope():
    for style in ("half", "interleaved"):
        hd = 16
        sin, cos = rope_cache(32, hd, 10000.0)
        p = 7
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, hd)),
                        jnp.float32)
        want = apply_rope(x[None], sin[p][None, None, None],
                          cos[p][None, None, None], style)[0]
        R = rope_matrix(sin[p], cos[p], style, hd)
        got = jnp.einsum("thd,de->the", x, R,
                         precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)


def test_fused_step_tiled_ffn_matches():
    """NT=2 FFN column tiling must match the untiled NT=1 kernel (real
    models tile to fit VMEM; tiny tests default to NT=1)."""
    from kuiperllama_tpu.ops.pallas.fused_decode import _fused_step

    cfg = tiny_config("llama2", dim=256, n_heads=4, n_kv_heads=2,
                      hidden_dim=256, vocab_size=512, seq_len=64)
    params = _mk_params(cfg, quant=True)
    A = 32
    cache = decoder.init_kv_cache(cfg, batch=1, max_len=A,
                                  dtype=jnp.bfloat16)
    tokens = jnp.asarray([[3, 1, 4]], jnp.int32)
    last, cache = decoder.prefill(cfg, params, tokens, cache)
    token = jnp.argmax(last, -1).astype(jnp.int32)
    pos = jnp.asarray([3], jnp.int32)

    L, _, _, KH, hd = cache["k"].shape
    x0 = params["tok_emb"][token]
    kc = cache["k"].reshape(L, A, KH * hd)
    vc = cache["v"].reshape(L, A, KH * hd)
    sin, cos = decoder.build_rope(cfg)
    kw = dict(H=cfg.n_heads, KH=KH, hd=hd,
              g=params["blocks"]["wqkv"].group_size, eps=cfg.norm_eps,
              quant=True, rope_style=cfg.rope_style)
    x1, k1, v1 = _fused_step(x0, jnp.copy(kc), jnp.copy(vc), pos[0],
                             sin[3], cos[3], params, n_tiles=1, **kw)
    x2, k2, v2 = _fused_step(x0, jnp.copy(kc), jnp.copy(vc), pos[0],
                             sin[3], cos[3], params, n_tiles=2, **kw)
    np.testing.assert_allclose(np.asarray(x2, np.float32),
                               np.asarray(x1, np.float32), rtol=0, atol=0.02)
    assert np.array_equal(np.asarray(k1, np.float32),
                          np.asarray(k2, np.float32))


def _assert_greedy_equiv(cfg, params, prompt, want, got):
    """Greedy outputs must match UNLESS the divergence step is an exact
    logit tie (tiny random bf16 models produce them; the chunk kernel's
    split-softmax rounding can break a tie the other way, which is an
    equally valid greedy continuation). On the first mismatch, teacher-
    force the `want` prefix through the oracle and require the two
    candidate tokens' logits to be within bf16 noise; stop comparing
    after (sequences legitimately differ past a tie)."""
    if got == want:
        return
    i = next(k for k, (a, b) in enumerate(zip(want, got)) if a != b)
    ids = list(prompt) + list(want[:i])
    A = 64
    cache = decoder.init_kv_cache(cfg, batch=1, max_len=A,
                                  dtype=jnp.bfloat16)
    logits, _ = decoder.prefill(cfg, params,
                                jnp.asarray([ids], jnp.int32), cache)
    v = np.asarray(logits[0])
    gap = abs(float(v[want[i]]) - float(v[got[i]]))
    assert gap <= 2e-3 * max(1.0, abs(float(v.max()))), (
        f"divergence at step {i} is not a tie: {want[i]} vs {got[i]}, "
        f"logit gap {gap}")


@pytest.mark.parametrize("family,quant", [
    ("llama2", True), ("qwen2", False), ("qwen2", True), ("llama2", False),
])
def test_fused_chunk_generation_matches(family, quant, monkeypatch):
    """Greedy CHUNK kernel (in-kernel lm_head + argmax + embedding DMA)
    must reproduce the unfused generator's greedy output up to exact
    logit ties. Opt-in path (KT_FUSED_CHUNK=1)."""
    monkeypatch.setenv("KT_FUSED_CHUNK", "1")
    cfg = tiny_config(family, seq_len=64)
    params = _mk_params(cfg, quant)
    prompt = [1, 7, 3, 2, 9]
    base = Generator(cfg, params, cache_len=64, cache_dtype=jnp.bfloat16,
                     fused_step=False, chunk=6)
    want, *_ = base.generate_ids(prompt, max_new_tokens=14)
    fast = Generator(cfg, params, cache_len=64, cache_dtype=jnp.bfloat16,
                     fused_step=True, chunk=6)
    got, *_ = fast.generate_ids(prompt, max_new_tokens=14)
    _assert_greedy_equiv(cfg, params, prompt, want, got)

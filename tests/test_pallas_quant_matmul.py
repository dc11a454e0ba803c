"""Pallas fused dequant matmul vs the XLA oracle (the reference's
CPU-oracle-vs-CUDA pattern, test/test_op/test_cu_matmul.cpp — here the
jnp/XLA group-wise expression is the oracle and the Pallas kernel the DUT;
on CPU the kernel runs in interpreter mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from kuiperllama_tpu.ops.linear import _quant_matmul_xla
from kuiperllama_tpu.ops.pallas.quant_matmul import quant_matmul
from kuiperllama_tpu.quant import dequantize, quantize_q80


def _mk(rng, M, K, N, g=64):
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    qa = quantize_q80(w, g)
    return jnp.asarray(x), qa


@pytest.mark.parametrize(
    "M,K,N",
    [
        (1, 128, 128),     # decode GEMV, tile-exact
        (8, 512, 256),     # multiple reduction tiles
        (4, 192, 320),     # non-tile-aligned K and N (padding path)
        (16, 128, 512),
    ],
)
def test_matches_dense_matmul(rng, M, K, N):
    x, qa = _mk(rng, M, K, N)
    got = np.asarray(quant_matmul(x, qa, mode="exact"))
    want = np.asarray(x @ dequantize(qa))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matches_xla_oracle(rng):
    x, qa = _mk(rng, 2, 256, 192)
    got = np.asarray(quant_matmul(x, qa, mode="exact"))
    want = np.asarray(_quant_matmul_xla(x, qa))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_3d_input(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 128)).astype(np.float32))
    w = (rng.standard_normal((128, 256)) * 0.05).astype(np.float32)
    qa = quantize_q80(w, 64)
    got = np.asarray(quant_matmul(x, qa, mode="exact"))
    want = np.asarray(x @ dequantize(qa))
    assert got.shape == (2, 3, 256)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bf16_activations(rng):
    x, qa = _mk(rng, 8, 256, 128)
    xb = x.astype(jnp.bfloat16)
    got = np.asarray(quant_matmul(xb, qa), dtype=np.float32)
    want = np.asarray(xb.astype(jnp.float32) @ dequantize(qa))
    # bf16 inputs: tolerance at bf16 resolution
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    assert quant_matmul(xb, qa, mode="fast").dtype == jnp.bfloat16


def test_fast_mode_bf16_class_error(rng):
    x, qa = _mk(rng, 8, 512, 256)
    got = np.asarray(quant_matmul(x, qa, mode="fast"))
    want = np.asarray(x @ dequantize(qa))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 1e-2, rel


def test_layered_matches_sliced(rng):
    """Layer-indexed kernel over stacked [L, K, N] weights == slicing the
    layer and using the single-layer kernel (both vs the XLA oracle)."""
    import jax.numpy as jnp
    from kuiperllama_tpu.ops.linear import _quant_matmul_xla
    from kuiperllama_tpu.ops.pallas.quant_matmul import quant_matmul_layered
    from kuiperllama_tpu.quant import QuantArray

    L, K, N, g, M = 3, 256, 384, 64, 4
    q = rng.integers(-127, 128, (L, K, N)).astype(np.int8)
    s = rng.uniform(0.005, 0.02, (L, K // g, N)).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = QuantArray(q=jnp.asarray(q), s=jnp.asarray(s), group_size=g)
    for li in range(L):
        got = np.asarray(quant_matmul_layered(
            jnp.asarray(x), w, jnp.int32(li), mode="exact"))
        wl = QuantArray(q=jnp.asarray(q[li]), s=jnp.asarray(s[li]),
                        group_size=g)
        want = np.asarray(_quant_matmul_xla(jnp.asarray(x), wl))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_layered_odd_shape_fallback(rng):
    """Shapes with no dividing tile route through the sliced fallback."""
    import jax.numpy as jnp
    from kuiperllama_tpu.ops.linear import _quant_matmul_xla
    from kuiperllama_tpu.ops.pallas.quant_matmul import quant_matmul_layered
    from kuiperllama_tpu.quant import QuantArray

    L, K, N, g = 2, 64, 192, 32  # 192 has no multiple-of-128 divisor
    q = rng.integers(-127, 128, (L, K, N)).astype(np.int8)
    s = rng.uniform(0.005, 0.02, (L, K // g, N)).astype(np.float32)
    x = rng.standard_normal((2, K)).astype(np.float32)
    w = QuantArray(q=jnp.asarray(q), s=jnp.asarray(s), group_size=g)
    got = np.asarray(quant_matmul_layered(
        jnp.asarray(x), w, jnp.int32(1), mode="exact"))
    wl = QuantArray(q=jnp.asarray(q[1]), s=jnp.asarray(s[1]), group_size=g)
    want = np.asarray(_quant_matmul_xla(jnp.asarray(x), wl))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_diag_gemv_matches_oracle(rng):
    """M=1 fast mode takes the block-diagonal GEMV path (P = blockdiag(x) @ q,
    scales applied to the group partials in fp32) — parity vs the oracle at
    several group counts, incl. a non-16-multiple ng and bf16 scales."""
    import jax.numpy as jnp
    from kuiperllama_tpu.quant import QuantArray

    for K, N, g in [(256, 384, 64), (896, 256, 64), (4096, 512, 64)]:
        ng = K // g
        q = rng.integers(-127, 128, (K, N)).astype(np.int8)
        s = rng.uniform(0.005, 0.02, (ng, N)).astype(np.float32)
        x = rng.standard_normal((1, K)).astype(np.float32)
        w = QuantArray(q=jnp.asarray(q), s=jnp.asarray(s), group_size=g)
        want = np.asarray(_quant_matmul_xla(jnp.asarray(x), w))
        got = np.asarray(
            quant_matmul(jnp.asarray(x, jnp.bfloat16), w, mode="fast"),
            dtype=np.float32)
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 1e-2, (K, N, rel)
        # bf16 scales (the production load path casts them)
        wb = QuantArray(q=w.q, s=w.s.astype(jnp.bfloat16), group_size=g)
        got_b = np.asarray(
            quant_matmul(jnp.asarray(x, jnp.bfloat16), wb, mode="fast"),
            dtype=np.float32)
        rel_b = np.abs(got_b - want).max() / (np.abs(want).max() + 1e-9)
        assert rel_b < 2e-2, (K, N, rel_b)


def test_diag_gemv_layered_matches_sliced(rng):
    """M=1 layered fast mode (the decode scan path) == slicing the layer."""
    import jax.numpy as jnp
    from kuiperllama_tpu.ops.pallas.quant_matmul import quant_matmul_layered
    from kuiperllama_tpu.quant import QuantArray

    L, K, N, g = 3, 512, 256, 64
    q = rng.integers(-127, 128, (L, K, N)).astype(np.int8)
    s = rng.uniform(0.005, 0.02, (L, K // g, N)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
    w = QuantArray(q=jnp.asarray(q), s=jnp.asarray(s), group_size=g)
    for li in range(L):
        got = np.asarray(quant_matmul_layered(x, w, jnp.int32(li)),
                         dtype=np.float32)
        wl = QuantArray(q=jnp.asarray(q[li]), s=jnp.asarray(s[li]),
                        group_size=g)
        want = np.asarray(_quant_matmul_xla(x.astype(jnp.float32), wl))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 1e-2, (li, rel)


def test_prefill_bigm_dequant_dot_route(rng):
    """linear()/linear_layered() route M >= KT_PREFILL_XLA_M (256) rows
    through the dequant-then-dot XLA path (r5: the Pallas kernel re-casts
    each weight tile per m-block, sinking prefill MFU); numerics must stay
    in the fast-mode class."""
    import jax.numpy as jnp
    from kuiperllama_tpu.ops.linear import (_dequant_dot_xla, linear,
                                            linear_layered)
    from kuiperllama_tpu.quant import QuantArray

    L, K, N, g, M = 2, 256, 384, 64, 512
    q = rng.integers(-127, 128, (L, K, N)).astype(np.int8)
    s = rng.uniform(0.005, 0.02, (L, K // g, N)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w0 = QuantArray(q=jnp.asarray(q[0]), s=jnp.asarray(s[0]), group_size=g)
    want = np.asarray(_quant_matmul_xla(x.astype(jnp.float32), w0))
    got = np.asarray(linear(x, w0), dtype=np.float32)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel
    # layered variant picks the same route with the dynamic layer slice
    wL = QuantArray(q=jnp.asarray(q), s=jnp.asarray(s), group_size=g)
    got1 = np.asarray(linear_layered(x, wL, jnp.int32(1)), dtype=np.float32)
    w1 = QuantArray(q=jnp.asarray(q[1]), s=jnp.asarray(s[1]), group_size=g)
    want1 = np.asarray(_quant_matmul_xla(x.astype(jnp.float32), w1))
    rel1 = np.abs(got1 - want1).max() / (np.abs(want1).max() + 1e-9)
    assert rel1 < 2e-2, rel1
    # the route really is the dequant-dot path at this M
    direct = np.asarray(_dequant_dot_xla(x, w0), dtype=np.float32)
    np.testing.assert_allclose(got, direct, rtol=0, atol=0)

"""Q8_0 quantization round-trip tests (reference tools/export.py:49-73)."""

import numpy as np
import jax.numpy as jnp

from kuiperllama_tpu.quant import (
    QuantArray, dequantize, quantize_q80, quantize_q80_np,
)


def test_roundtrip_error_small(rng):
    w = rng.standard_normal((256, 128)).astype(np.float32)
    qa = quantize_q80(w, 64)
    err = np.abs(np.asarray(dequantize(qa)) - w).max()
    # export.py prints "max error ... O(~0.001)" for unit-scale weights
    assert err < 0.02, err
    assert qa.q.dtype == jnp.int8 and qa.s.dtype == jnp.float32
    assert qa.q.shape == (256, 128) and qa.s.shape == (4, 128)


def test_matches_numpy_rowmajor_layout(rng):
    # The jax groups-along-in quantizer must agree with the on-disk row-major
    # quantizer after transposition: disk layout is [out, in] flattened.
    w_ref = rng.standard_normal((32, 128)).astype(np.float32)  # [out, in]
    q_flat, s_flat, _ = quantize_q80_np(w_ref, 64)
    q_disk = q_flat.reshape(32, 128).T          # -> [in, out]
    s_disk = s_flat.reshape(32, 2).T            # -> [in//64, out]
    qa = quantize_q80(w_ref.T, 64)              # ours: groups along in (axis -2)
    np.testing.assert_array_equal(np.asarray(qa.q), q_disk)
    np.testing.assert_allclose(np.asarray(qa.s), s_disk, rtol=1e-6)


def test_zero_group_safe():
    w = np.zeros((64, 8), np.float32)
    qa = quantize_q80(w, 64)
    assert np.all(np.asarray(qa.q) == 0)
    assert np.all(np.asarray(dequantize(qa)) == 0)

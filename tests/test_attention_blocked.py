"""Memory-bounded (query-blocked) prefill attention vs the unblocked path:
the block split is over the embarrassingly-parallel query axis, so the math
is identical per row — differences are only XLA picking different dot
vectorizations per shape (~1e-7 fp32). The r3 long-context serving bench
rows OOMed on the unblocked score tensor; these tests pin the replacement's
numerics."""

import jax.numpy as jnp
import numpy as np

from kuiperllama_tpu.ops.attention import attention_dense, _attention_full


def _mk(B=2, T=64, S=96, H=4, KH=2, hd=8, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), dtype)
    k = jnp.asarray(rng.standard_normal((B, S, KH, hd)), dtype)
    v = jnp.asarray(rng.standard_normal((B, S, KH, hd)), dtype)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    return q, k, v, pos


def test_blocked_bitwise_equal_unblocked():
    q, k, v, pos = _mk()
    want = _attention_full(q, k, v, pos)
    got = attention_dense(q, k, v, pos, q_block=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-6)


def test_blocked_with_len_mask():
    q, k, v, pos = _mk(T=32, S=64)
    lens = jnp.asarray([20, 64], jnp.int32)
    mask = jnp.arange(64, dtype=jnp.int32)[None, :] < lens[:, None]
    want = _attention_full(q, k, v, pos, kv_len_mask=mask)
    got = attention_dense(q, k, v, pos, kv_len_mask=mask, q_block=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-6)


def test_blocked_bf16():
    q, k, v, pos = _mk(dtype=jnp.bfloat16)
    want = _attention_full(q, k, v, pos)
    got = attention_dense(q, k, v, pos, q_block=32)
    assert np.array_equal(np.asarray(got, np.float32),
                          np.asarray(want, np.float32))


def test_auto_threshold_not_triggered_small():
    # small shapes must take the unblocked path (q_block=None, under the
    # byte threshold) and still be exact
    q, k, v, pos = _mk(T=16, S=16)
    want = _attention_full(q, k, v, pos)
    got = attention_dense(q, k, v, pos)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_indivisible_T_falls_back():
    # T not a multiple of q_block: must fall back to unblocked, not crash
    q, k, v, pos = _mk(T=23, S=64)
    want = _attention_full(q, k, v, pos)
    got = attention_dense(q, k, v, pos, q_block=16)
    assert np.array_equal(np.asarray(got), np.asarray(want))

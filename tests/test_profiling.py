"""Observability utilities (supersede the reference's tick.h macros)."""

import jax.numpy as jnp

from kuiperllama_tpu.utils.profiling import Timer, device_time, log_json


def test_timer_summary():
    t = Timer()
    with t.phase("prefill"):
        pass
    with t.phase("decode"):
        pass
    with t.phase("decode"):
        pass
    s = t.summary()
    assert "prefill" in s and "decode" in s
    assert t.counts["decode"] == 2


def test_device_time_orders_work():
    small = lambda x: x * 1.000001
    big = lambda x: jnp.tanh(x @ x) * 0.999
    x_small = jnp.ones((8, 8))
    x_big = jnp.ones((256, 256))
    ts = device_time(small, x_small, iters=16, reps=3)
    tb = device_time(big, x_big, iters=16, reps=3)
    assert ts >= 0 and tb >= 0


def test_log_json(capsys):
    log_json("bench", tokens_per_s=123.4)
    err = capsys.readouterr().err
    assert '"event": "bench"' in err

"""HTTP serving front-end (serving/server.py): concurrent clients against
the engine-thread wrapper + a real localhost HTTP round trip. Outputs must
match direct Generator runs (continuous batching changes scheduling, not
results)."""

import json
import threading
import urllib.request

import jax.numpy as jnp
import pytest

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.ops.linear import set_use_pallas
from kuiperllama_tpu.serving.engine import PagedEngine
from kuiperllama_tpu.serving.generate import Generator
from kuiperllama_tpu.serving.server import InferenceServer, make_http_server


@pytest.fixture(autouse=True)
def _xla_path():
    set_use_pallas(False)
    yield
    set_use_pallas(True)


@pytest.fixture(scope="module")
def served():
    cfg = tiny_config("llama2", seq_len=64)
    params = to_device(random_params(cfg, seed=17), dtype=jnp.float32)
    eng = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                      cache_dtype=jnp.float32, page_size=8)
    srv = InferenceServer(eng)
    srv.start()
    yield cfg, params, srv
    srv.stop()


def test_concurrent_submissions_match_generator(served):
    cfg, params, srv = served
    prompts = [[1, 5, 9], [2, 3, 4, 4], [7, 7], [11, 2, 3, 5]]
    gen = Generator(cfg, params, cache_len=64, cache_dtype=jnp.float32)
    want = [gen.generate_ids(p, max_new_tokens=6)[0] for p in prompts]

    results = [None] * len(prompts)

    def client(i):
        results[i] = srv.submit(prompt_ids=prompts[i], max_new_tokens=6)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, r in enumerate(results):
        assert r is not None, i
        assert r["ids"] == want[i], (i, r["ids"], want[i])
        assert r["ttft_ms"] >= 0


def test_http_round_trip(served):
    cfg, params, srv = served
    httpd = make_http_server(srv, "127.0.0.1", 0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"prompt_ids": [3, 1, 4], "max_new_tokens": 5}
                          ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        gen = Generator(cfg, params, cache_len=64, cache_dtype=jnp.float32)
        want, *_ = gen.generate_ids([3, 1, 4], max_new_tokens=5)
        assert out["ids"] == want
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            hz = json.loads(resp.read())
        assert hz["ok"] is True
    finally:
        httpd.shutdown()


def test_metrics_endpoint(served):
    cfg, params, srv = served
    srv.submit(prompt_ids=[5, 2], max_new_tokens=4)
    m = srv.metrics()
    assert m["served"] >= 1 and m["tokens"] >= 1
    assert "ttft_s_p50" in m and m["ttft_s_p50"] >= 0
    assert m["latency_s_p99"] >= m["latency_s_p50"] >= 0

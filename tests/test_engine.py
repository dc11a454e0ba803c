"""Continuous-batching engine tests: results must match single-request
generation exactly (greedy), slots must recycle, TTFT must be recorded."""

import numpy as np
import jax.numpy as jnp
import pytest

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.serving.engine import Engine, Request
from kuiperllama_tpu.serving.generate import Generator
from kuiperllama_tpu.ops.linear import set_use_pallas


@pytest.fixture(autouse=True)
def _xla_path():
    set_use_pallas(False)
    yield
    set_use_pallas(True)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config("llama2", seq_len=64)
    params = to_device(random_params(cfg, seed=11), dtype=jnp.float32)
    return cfg, params


def test_engine_matches_generator(model):
    cfg, params = model
    gen = Generator(cfg, params, cache_len=64)
    prompts = [[1, 5, 9], [2, 3], [7, 7, 7, 7], [4]]
    want = [gen.generate_ids(p, max_new_tokens=10)[0] for p in prompts]

    eng = Engine(cfg, params, max_batch=2, max_len=64, chunk=4,
                 cache_dtype=jnp.float32)
    reqs = [Request(prompt_ids=p, max_new_tokens=10) for p in prompts]
    done = eng.run(reqs)
    assert len(done) == 4
    got = {r.request_id: r.out_ids for r in done}
    for req, w in zip(reqs, want):
        assert got[req.request_id] == w, (req.prompt_ids, got[req.request_id], w)


def test_engine_continuous_admission(model):
    cfg, params = model
    eng = Engine(cfg, params, max_batch=2, max_len=64, chunk=4,
                 cache_dtype=jnp.float32)
    # more requests than slots: engine must recycle slots
    reqs = [Request(prompt_ids=[i + 1, i + 2], max_new_tokens=6)
            for i in range(5)]
    done = eng.run(reqs)
    assert len(done) == 5
    for r in done:
        assert len(r.out_ids) == 6
        assert r.ttft_s >= 0
        assert r.finish_time >= r.first_token_time


def test_engine_max_tokens_respected(model):
    cfg, params = model
    eng = Engine(cfg, params, max_batch=4, max_len=64, chunk=8,
                 cache_dtype=jnp.float32)
    done = eng.run([Request(prompt_ids=[3, 1], max_new_tokens=1),
                    Request(prompt_ids=[3, 1], max_new_tokens=13)])
    lens = sorted(len(r.out_ids) for r in done)
    assert lens == [1, 13]


def test_paged_engine_matches_dense(model):
    from kuiperllama_tpu.serving.engine import PagedEngine

    cfg, params = model
    dense = Engine(cfg, params, max_batch=2, max_len=64, chunk=4,
                   cache_dtype=jnp.float32)
    paged = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                        cache_dtype=jnp.float32, page_size=128)
    prompts = [[1, 5, 9], [2, 3], [7, 7, 7, 7], [4, 11]]
    want = dense.run([Request(prompt_ids=p, max_new_tokens=9) for p in prompts])
    got = paged.run([Request(prompt_ids=p, max_new_tokens=9) for p in prompts])
    assert len(got) == len(want) == 4
    w = sorted((tuple(r.prompt_ids), tuple(r.out_ids)) for r in want)
    g = sorted((tuple(r.prompt_ids), tuple(r.out_ids)) for r in got)
    assert g == w


@pytest.mark.parametrize("backend", ["dense", "paged"])
def test_admission_is_batched(model, backend):
    """All requests admitted at a step boundary must prefill in ONE forward
    (round-1 ran a serial prefill per request, stalling decode), and decode
    must progress while further requests wait in the queue."""
    from kuiperllama_tpu.serving.engine import PagedEngine

    cfg, params = model
    cls = Engine if backend == "dense" else PagedEngine
    eng = cls(cfg, params, max_batch=4, max_len=64, chunk=4,
              cache_dtype=jnp.float32)
    calls = []
    orig = eng._prefill_batch
    eng._prefill_batch = lambda slots, toks, lens, rng: (
        calls.append(len([s for s in slots if s < eng.max_batch]))
        or orig(slots, toks, lens, rng))
    # 6 requests, 4 slots: step 1 admits 4 in one prefill; the next admits
    # happen only when slots free up, while earlier rows keep decoding
    reqs = [Request(prompt_ids=[i + 1, i + 2], max_new_tokens=6)
            for i in range(6)]
    done = eng.run(reqs)
    assert len(done) == 6
    assert calls[0] == 4, calls  # first admission batch covers all 4 slots
    assert sum(calls) == 6 and len(calls) >= 2
    # decode progressed between the two admission waves
    first_wave = [r for r in done[:4]]
    assert all(len(r.out_ids) == 6 for r in first_wave)


def test_paged_engine_page_recycling(model):
    from kuiperllama_tpu.serving.engine import PagedEngine

    cfg, params = model
    eng = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                      cache_dtype=jnp.float32, page_size=128, n_pages=4)
    reqs = [Request(prompt_ids=[i + 1, i + 2], max_new_tokens=5)
            for i in range(5)]
    done = eng.run(reqs)
    assert len(done) == 5
    assert all(len(r.out_ids) == 5 for r in done)
    assert eng.allocator.n_free_pages == 3  # page 0 reserved


def test_chunked_prefill_matches_single_shot(model):
    """prefill_chunk=C must produce EXACTLY the single-shot engine's greedy
    outputs: chunk-continuation attention (prior context gathered from
    pages + causal in-chunk) is numerically the same prefill."""
    from kuiperllama_tpu.serving.engine import PagedEngine

    cfg, params = model
    prompts = [list(range(1, 41)), [2, 3], list(range(5, 30)), [7] * 37]
    single = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                         cache_dtype=jnp.float32, page_size=8)
    want = single.run([Request(prompt_ids=p, max_new_tokens=8)
                       for p in prompts])
    chunked = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                          cache_dtype=jnp.float32, page_size=8,
                          prefill_chunk=16, admit_chunk=2)
    got = chunked.run([Request(prompt_ids=p, max_new_tokens=8)
                       for p in prompts])
    w = sorted((tuple(r.prompt_ids), tuple(r.out_ids)) for r in want)
    g = sorted((tuple(r.prompt_ids), tuple(r.out_ids)) for r in got)
    assert g == w


def test_decode_progresses_during_chunked_admission(model):
    """Active slots must keep generating WHILE a long-prompt admission is
    mid-prefill (the r2 engine stalled all decode for the whole prefill)."""
    from kuiperllama_tpu.serving.engine import PagedEngine

    cfg, params = model
    eng = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=8,
                      cache_dtype=jnp.float32, page_size=8,
                      prefill_chunk=8, admit_chunk=2)
    a = Request(prompt_ids=[1, 5, 9], max_new_tokens=40)
    eng.submit(a)
    eng.step()  # admit + start decoding A
    assert len(a.out_ids) > 0
    b = Request(prompt_ids=list(range(1, 41)), max_new_tokens=4)
    eng.submit(b)
    progressed_during_wave = 0
    waves_seen = 0
    for _ in range(20):
        before = len(a.out_ids)
        eng.step()
        if eng._wave is not None:  # B's prefill still in flight
            waves_seen += 1
            progressed_during_wave += len(a.out_ids) - before
        if b.first_token_time:
            break
    assert waves_seen >= 2, "long prompt should take multiple chunks"
    assert progressed_during_wave > 0, (
        "decode made no progress during the admission wave")
    # B still completes correctly
    eng.run([])
    assert b.finished and len(b.out_ids) == 4, (b.finished, b.out_ids)

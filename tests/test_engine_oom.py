"""Pool-pressure policy tests: mid-decode page OOM must preempt + resume
(never crash — the r3 engine asserted, serving/engine.py:530 r3), and
decode-growth reservation at admission must prevent the pressure entirely.
Preempted requests resume via a prefill of prompt + generated-so-far, so
greedy outputs are EXACTLY those of an unconstrained run."""

import jax.numpy as jnp
import numpy as np
import pytest

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.params import random_params, to_device
from kuiperllama_tpu.ops.linear import set_use_pallas
from kuiperllama_tpu.serving.engine import PagedEngine, Request


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


def _run(cfg, params, n_pages, reserve_growth, prompts, max_new=20):
    eng = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                      cache_dtype=jnp.float32, page_size=8, n_pages=n_pages,
                      reserve_growth=reserve_growth)
    done = eng.run([Request(prompt_ids=list(p), max_new_tokens=max_new)
                    for p in prompts])
    return eng, done


def _outputs(done):
    return sorted((tuple(r.prompt_ids), tuple(r.out_ids)) for r in done)


def test_preemption_under_pool_pressure(model):
    """Over-committed pool (reserve_growth=False): both slots fill, decode
    growth exhausts pages, the youngest slot is preempted and later resumes
    — every request completes with outputs equal to a roomy run."""
    cfg, params = model
    prompts = [[1, 5, 9, 2], [2, 3, 4, 4], [7, 7, 7, 7]]
    # roomy pool: no pressure ever
    _, want = _run(cfg, params, n_pages=32, reserve_growth=False, prompts=prompts)
    # tight pool: 5 usable pages of 8 tokens; each request grows to
    # 4 + 20 + 1 tokens ~ 4 pages, two active slots need 8 > 5
    eng, got = _run(cfg, params, n_pages=6, reserve_growth=False,
                    prompts=prompts)
    assert len(got) == 3
    assert all(len(r.out_ids) == 20 for r in got)
    assert eng.n_preemptions > 0, "tight pool must have forced a preemption"
    assert any(r.preempted for r in got)
    assert _outputs(got) == _outputs(want)
    # all pages returned
    assert eng.allocator.n_free_pages == 5


def test_reserve_growth_prevents_preemption(model):
    """Default policy: admission reserves prompt + max_new_tokens pages, so
    the same tight pool serializes admissions instead of preempting."""
    cfg, params = model
    prompts = [[1, 5, 9, 2], [2, 3, 4, 4], [7, 7, 7, 7]]
    _, want = _run(cfg, params, n_pages=32, reserve_growth=True,
                   prompts=prompts)
    eng, got = _run(cfg, params, n_pages=6, reserve_growth=True,
                    prompts=prompts)
    assert len(got) == 3
    assert eng.n_preemptions == 0
    assert all(r.preempted == 0 for r in got)
    assert _outputs(got) == _outputs(want)


def test_oversized_request_fails_loudly(model):
    """A request that cannot EVER fit must raise, not spin forever."""
    cfg, params = model
    eng = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                      cache_dtype=jnp.float32, page_size=8, n_pages=3,
                      reserve_growth=True)
    eng.submit(Request(prompt_ids=list(range(1, 30)), max_new_tokens=30))
    with pytest.raises(RuntimeError, match="KV pages"):
        eng.run([])


def test_preempt_at_cache_capacity_retires(model):
    """A victim whose prompt + generated already fills max_len must be
    RETIRED by the preemption, not re-queued: a re-queue would trip
    _pop_admits' `n < max_len` invariant on resume and crash the engine
    in exactly the over-commit mode preemption exists to protect
    (ADVICE r4, medium).

    The window: a slot admitted with a max_len-1-token prompt has
    eff = pos + 1 = max_len right after _activate appends the prefill's
    sampled token, BEFORE any _collect capacity check runs — a pool-
    pressure preemption in that same chunk picks it (youngest) as victim."""
    cfg, params = model
    eng = PagedEngine(cfg, params, max_batch=2, max_len=16, chunk=4,
                      cache_dtype=jnp.float32, page_size=4, n_pages=8,
                      reserve_growth=False)
    # A decodes alone until it holds 3 of the 7 usable pages
    a = Request(prompt_ids=[1, 5], max_new_tokens=30)
    eng.submit(a)
    done = []
    while not done and eng.has_work:
        done.extend(eng.step())
        if int(np.asarray(eng.pos).max()) >= 9:
            break
    # B fills its cache at admission: prompt 15 = max_len - 1, so after
    # the prefill token lands eff(B) == max_len while pos(B) == 15
    b = Request(prompt_ids=list(range(1, 16)), max_new_tokens=30)
    eng.submit(b)
    while eng.has_work:  # must not raise (old code: assert in _pop_admits)
        done.extend(eng.step())
    assert {r.request_id for r in done} == {a.request_id, b.request_id}
    assert all(r.finished for r in done)
    assert eng.allocator.n_free_pages == 7  # all pages returned


def test_ttft_preserved_across_preemption(model):
    """first_token_time must record the FIRST token, not the resume."""
    cfg, params = model
    prompts = [[1, 5, 9, 2], [2, 3, 4, 4], [7, 7, 7, 7]]
    eng, got = _run(cfg, params, n_pages=6, reserve_growth=False,
                    prompts=prompts)
    pre = [r for r in got if r.preempted]
    assert pre
    for r in pre:
        assert 0 < r.ttft_s < (r.finish_time - r.submit_time)

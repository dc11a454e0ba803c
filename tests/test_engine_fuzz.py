"""Seeded scheduler fuzz: mixed prompt lengths + staggered submission +
tight page pool (preemptions) + chunked prefill, asserted EXACT against
an unconstrained roomy run. This is the combined-stress companion to the
single-feature engine tests — the r5 engine rewired its host/device
round trips (fused meta fetch, host pos mirror, packed uploads), and the
invariant that must survive every scheduling interleaving is: greedy
outputs are exactly those of a roomy single-shot engine."""

import numpy as np
import jax.numpy as jnp
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
    params = to_device(random_params(cfg, seed=13), dtype=jnp.float32)
    return cfg, params


def _mk_requests(rng, n):
    reqs = []
    for _ in range(n):
        plen = int(rng.integers(1, 24))
        ids = [int(t) for t in rng.integers(1, 50, plen)]
        reqs.append((ids, int(rng.integers(2, 14))))
    return reqs


def _outputs(done):
    return sorted((tuple(r.prompt_ids), r.max_new_tokens, tuple(r.out_ids))
                  for r in done)


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_stressed_matches_roomy(model, seed):
    cfg, params = model
    rng = np.random.default_rng(seed)
    spec = _mk_requests(rng, 7)

    # oracle: roomy pool, all submitted at once, no chunked prefill
    roomy = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                        cache_dtype=jnp.float32, page_size=8, n_pages=40)
    want = _outputs(roomy.run(
        [Request(prompt_ids=list(p), max_new_tokens=m) for p, m in spec]))

    # stressed: tight over-committed pool + chunked prefill + staggered
    # submission (a new request lands between every engine step)
    eng = PagedEngine(cfg, params, max_batch=2, max_len=64, chunk=4,
                      cache_dtype=jnp.float32, page_size=8, n_pages=7,
                      reserve_growth=False, prefill_chunk=8)
    pending = [Request(prompt_ids=list(p), max_new_tokens=m)
               for p, m in spec]
    done = []
    while pending or eng.has_work:
        if pending:
            eng.submit(pending.pop(0))
        if eng.has_work:
            done.extend(eng.step())
    assert _outputs(done) == want
    assert eng.allocator.n_free_pages == 6  # every page returned
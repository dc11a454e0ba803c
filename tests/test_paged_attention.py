"""Paged flash-decode attention vs the dense jnp oracle, plus page
allocator/write-path tests (reference strategy: CPU oracle vs device kernel,
test/test_op/test_cu_*.cpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.kvcache import (
    PageAllocator, init_paged_cache, write_tokens_paged,
)
from kuiperllama_tpu.ops.attention import attention_dense
from kuiperllama_tpu.ops.pallas.paged_attention import paged_attention


def _dense_oracle(q, k_all, v_all, seq_lens):
    """q [B,H,hd], k_all/v_all [B,S,KH,hd] with first seq_lens[b] rows valid."""
    B, H, hd = q.shape
    S = k_all.shape[1]
    positions = (seq_lens - 1)[:, None].astype(jnp.int32)  # [B,1]
    slot = jnp.arange(S, dtype=jnp.int32)
    mask = slot[None, :] < seq_lens[:, None]
    out = attention_dense(q[:, None], jnp.asarray(k_all), jnp.asarray(v_all),
                          positions, kv_len_mask=jnp.asarray(mask))
    return np.asarray(out[:, 0])


@pytest.mark.parametrize("kv_mul", [1, 4])
@pytest.mark.parametrize("lens", [[1], [128], [129, 3], [400, 256, 17]])
def test_paged_matches_dense(rng, lens, kv_mul):
    ps = 128
    KH, hd = 2, 32
    H = KH * kv_mul
    B = len(lens)
    S = 512
    max_pages = S // ps

    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    k_all = rng.standard_normal((B, S, KH, hd)).astype(np.float32)
    v_all = rng.standard_normal((B, S, KH, hd)).astype(np.float32)

    # build page pool: sequential pages per sequence
    # (layout per kvcache.py: k AND v are [P, ps, KH*hd])
    n_pages = B * max_pages + 1
    k_pages = np.zeros((n_pages, ps, KH * hd), np.float32)
    v_pages = np.zeros((n_pages, ps, KH * hd), np.float32)
    page_table = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        for pi in range(max_pages):
            page = 1 + b * max_pages + pi  # page 0 left as garbage guard
            page_table[b, pi] = page
            chunk = k_all[b, pi * ps:(pi + 1) * ps]  # [ps, KH, hd]
            k_pages[page] = chunk.reshape(ps, KH * hd)
            v_pages[page] = v_all[b, pi * ps:(pi + 1) * ps].reshape(
                ps, KH * hd)

    seq_lens = np.asarray(lens, np.int32)
    got = np.asarray(paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(page_table), jnp.asarray(seq_lens), page_size=ps,
    ))
    want = _dense_oracle(jnp.asarray(q), k_all, v_all, jnp.asarray(seq_lens))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_paged_mha_7b_geometry(rng):
    """MHA shape class (kv_mul=1, hd=128 — Llama-2-7B is KH=32): one query
    head per kv head exercises the block-diagonal mask at its widest."""
    ps, KH, hd = 128, 8, 128
    B, S = 2, 256
    lens = [200, 129]
    q = rng.standard_normal((B, KH, hd)).astype(np.float32)
    k_all = rng.standard_normal((B, S, KH, hd)).astype(np.float32)
    v_all = rng.standard_normal((B, S, KH, hd)).astype(np.float32)
    max_pages = S // ps
    k_pages = np.zeros((B * max_pages + 1, ps, KH * hd), np.float32)
    v_pages = np.zeros((B * max_pages + 1, ps, KH * hd), np.float32)
    page_table = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        for pi in range(max_pages):
            page = 1 + b * max_pages + pi
            page_table[b, pi] = page
            chunk = k_all[b, pi * ps:(pi + 1) * ps]
            k_pages[page] = chunk.reshape(ps, KH * hd)
            v_pages[page] = v_all[b, pi * ps:(pi + 1) * ps].reshape(
                ps, KH * hd)
    seq_lens = np.asarray(lens, np.int32)
    got = np.asarray(paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(page_table), jnp.asarray(seq_lens), page_size=ps,
    ))
    want = _dense_oracle(jnp.asarray(q), k_all, v_all, jnp.asarray(seq_lens))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_page_allocator():
    # page 0 is the reserved garbage sink -> 8 usable pages
    al = PageAllocator(n_pages=9, page_size=4, max_seqs=4, max_len=16)
    assert al.alloc_seq(0, 5)  # 2 pages
    assert al.alloc_seq(1, 4)  # 1 page
    assert al.n_free_pages == 5
    assert al.extend_seq(0, 8)      # still 2 pages
    assert al.extend_seq(0, 9)      # 3rd page
    assert al.n_free_pages == 4
    al.free_seq(0)
    assert al.n_free_pages == 7
    assert al.alloc_seq(2, 16)      # 4 pages
    assert not al.alloc_seq(3, 16)  # only 3 left -> OOM
    assert al.alloc_seq(3, 12)


def test_write_tokens_paged(rng):
    cfg = tiny_config("llama2", n_heads=4, n_kv_heads=2, dim=64)
    ps = 4
    cache = init_paged_cache(cfg, n_pages=6, page_size=ps, dtype=jnp.float32)
    L, KH, hd = cfg.n_layers, 2, cfg.head_dim

    B, T = 2, 3
    k_new = rng.standard_normal((L, B, T, KH, hd)).astype(np.float32)
    v_new = rng.standard_normal((L, B, T, KH, hd)).astype(np.float32)
    # row 0 tokens at positions 2,3,4 of pages [1,2]; row 1 at 0,1,2 of page 5
    pages = np.asarray([[1, 1, 2], [5, 5, 5]], np.int32)
    offs = np.asarray([[2, 3, 0], [0, 1, 2]], np.int32)
    cache = write_tokens_paged(cache, jnp.asarray(k_new), jnp.asarray(v_new),
                               jnp.asarray(pages), jnp.asarray(offs))
    # k/v [L, P, ps, KH*hd]: token (page, off) of kv head h at
    # [page, off, h*hd:(h+1)*hd]
    kp = np.asarray(cache.k_pages).reshape(L, 6, ps, KH, hd)
    def at(pool, page, off):  # -> [L, KH, hd]
        return pool[:, page, off]
    np.testing.assert_allclose(at(kp, 1, 2), k_new[:, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(at(kp, 1, 3), k_new[:, 0, 1], rtol=1e-6)
    np.testing.assert_allclose(at(kp, 2, 0), k_new[:, 0, 2], rtol=1e-6)
    np.testing.assert_allclose(at(kp, 5, 1), k_new[:, 1, 1], rtol=1e-6)
    vp = np.asarray(cache.v_pages).reshape(L, 6, ps, KH, hd)
    np.testing.assert_allclose(at(vp, 5, 2), v_new[:, 1, 2], rtol=1e-6)

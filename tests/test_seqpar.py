"""Sequence-parallel (split-K) paged decode attention: page-dim-sharded
partials merged via the exact flash identity must equal the single-device
paged kernel and the dense oracle (SURVEY §5.7 long-context building block;
virtual 8-device mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from kuiperllama_tpu.ops.attention import attention_dense
from kuiperllama_tpu.ops.pallas.paged_attention import (
    build_work_list, merge_flash_many, merge_flash_parts, paged_attention)
from kuiperllama_tpu.parallel.mesh import make_mesh
from kuiperllama_tpu.parallel.seqpar import (SeqParAttention,
                                             build_work_lists_sharded)


def _mk_case(rng, B=3, KH=2, kv_mul=2, hd=16, ps=8, S=64, n_pages=None):
    H = KH * kv_mul
    lens = rng.integers(ps + 1, S, size=B)
    n_pages = n_pages or (B * (S // ps) + 8)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    kp = np.zeros((n_pages, ps, KH * hd), np.float32)
    vp = np.zeros((n_pages, ps, KH * hd), np.float32)
    mp = S // ps
    pt = np.zeros((B, mp), np.int32)
    # deliberately interleave page ownership across the pool so every shard
    # gets pages from several sequences
    order = rng.permutation(np.arange(1, n_pages))
    k_all = rng.standard_normal((B, S, KH, hd)).astype(np.float32)
    v_all = rng.standard_normal((B, S, KH, hd)).astype(np.float32)
    it = iter(order)
    for b in range(B):
        for pi in range(-(-int(lens[b]) // ps)):
            page = int(next(it))
            pt[b, pi] = page
            kp[page] = k_all[b, pi * ps:(pi + 1) * ps].reshape(ps, KH * hd)
            vp[page] = v_all[b, pi * ps:(pi + 1) * ps].reshape(ps, KH * hd)
    return q, kp, vp, pt, lens.astype(np.int32), k_all, v_all


def test_seqpar_matches_single_device_and_oracle(rng):
    ps = 8
    q, kp, vp, pt, lens, k_all, v_all = _mk_case(rng, ps=ps, n_pages=64)
    mesh = make_mesh(dp=1, tp=8)
    sp = SeqParAttention(mesh, page_size=ps)
    kps, vps = sp.shard_pages(jnp.asarray(kp), jnp.asarray(vp))
    got = np.asarray(sp(jnp.asarray(q), kps, vps, pt, lens))

    want_single = np.asarray(paged_attention(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(pt), jnp.asarray(lens), page_size=ps))
    np.testing.assert_allclose(got, want_single, atol=2e-5)

    S = k_all.shape[1]
    mask = np.arange(S)[None, :] < lens[:, None]
    want = np.asarray(attention_dense(
        jnp.asarray(q[:, None]), jnp.asarray(k_all), jnp.asarray(v_all),
        jnp.asarray((lens - 1)[:, None].astype(np.int32)),
        kv_len_mask=jnp.asarray(mask)))[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_work_list_sharding_covers_everything(rng):
    ps = 8
    _, _, _, pt, lens, _, _ = _mk_case(rng, ps=ps, n_pages=64)
    fb, fp, ft, ni, cov = build_work_lists_sharded(pt, lens, ps, 8, 64)
    # every (b, page) of the global walk appears exactly once across shards
    gb, gp, gt, gn = build_work_list(pt, lens, ps)
    global_items = {(int(gb[i]), int(gp[i]), int(gt[i]))
                    for i in range(int(gn[0]))}
    seen = set()
    pl = 64 // 8
    for s in range(8):
        for i in range(int(ni[s, 0])):
            item = (int(fb[s, i]), int(fp[s, i]) + s * pl, int(ft[s, i]))
            assert item not in seen
            seen.add(item)
            assert cov[s, fb[s, i]]
    assert seen == global_items


def test_merge_flash_many_matches_pairwise(rng):
    B, H, hd = 2, 4, 8
    acc = jnp.asarray(rng.standard_normal((3, B, H, hd)).astype(np.float32))
    m = jnp.asarray(rng.standard_normal((3, B, H)).astype(np.float32))
    l = jnp.asarray(rng.uniform(0.5, 2.0, (3, B, H)).astype(np.float32))
    many = merge_flash_many(acc, m, l)
    # fold pairwise: merge(a, b) gives a NORMALIZED result; to chain,
    # un-normalize by the combined l and max — equivalent closed form below
    m12 = jnp.maximum(m[0], m[1])
    acc12 = acc[0] * jnp.exp(m[0] - m12)[..., None] \
        + acc[1] * jnp.exp(m[1] - m12)[..., None]
    l12 = l[0] * jnp.exp(m[0] - m12) + l[1] * jnp.exp(m[1] - m12)
    pair = merge_flash_parts(acc12, m12, l12, acc[2], m[2], l[2])
    np.testing.assert_allclose(np.asarray(many), np.asarray(pair),
                               rtol=2e-6, atol=2e-6)

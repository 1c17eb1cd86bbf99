"""Parity tests for the fused Pallas beam-search kernel (ops/pallas_beam.py)
against the XLA batched_beam_search, via TPU interpret mode on CPU.

The kernel claims EXACT semantics for its supported configuration
(expand=1, k=0, fp32 inline blocks): same frontier sets, same (dist, id)
order, same visited/cmps counters. Distances may differ by float summation
order (the kernel reduces each query's w lanes inside a segment matmul),
so dists compare with a tight tolerance while ids compare exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rangefilteredann_tpu.ops.beam_search import batched_beam_search
from rangefilteredann_tpu.ops.pallas_beam import (
    QB,
    build_meta,
    pallas_beam_search_inline,
)
from rangefilteredann_tpu.ops.distances import gathered_distances
from rangefilteredann_tpu.ops.topk import EMPTY_ID


def _random_slab(rng, m, r, w):
    """Random connected-ish slab graph + fp32 inline blocks."""
    data = rng.normal(size=(m, w)).astype(np.float32)
    norms = np.einsum("ij,ij->i", data, data).astype(np.float32)
    nbrs = np.full((m, r), -1, dtype=np.int32)
    for i in range(m):
        deg = rng.integers(1, r + 1)
        cand = rng.choice(m, size=deg, replace=False)
        cand = cand[cand != i]
        nbrs[i, : len(cand)] = np.sort(cand)
    safe = np.clip(nbrs, 0, m - 1)
    nbr_vecs = data[safe]  # [m, r, w]
    nbr_norms = norms[safe]
    return (jnp.asarray(data), jnp.asarray(norms), jnp.asarray(nbrs),
            jnp.asarray(nbr_vecs), jnp.asarray(nbr_norms))


@pytest.mark.parametrize("metric", ["l2", "mips"])
@pytest.mark.parametrize("r,beam,limit", [(5, 8, 10_000), (48, 40, 10_000),
                                          (48, 40, 7)])
def test_pallas_beam_matches_xla(metric, r, beam, limit):
    rng = np.random.default_rng(42 + r + beam)
    m, w, q = 300, 128, QB
    data, norms, nbrs, nbr_vecs, nbr_norms = _random_slab(rng, m, r, w)
    queries = jnp.asarray(rng.normal(size=(q, w)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, m, size=q).astype(np.int32))
    active = np.ones(q, dtype=bool)
    active[q - 3:] = False  # exercise padded/inactive rows
    active = jnp.asarray(active)
    s2g = jnp.arange(m, dtype=jnp.int32)

    ref = batched_beam_search(
        data, norms, nbrs, s2g, queries, starts,
        beam=beam, k=0, cut=jnp.float32(1.35), limit=jnp.int32(limit),
        metric=metric, active_in=active, expand=1, identity_map=True,
        nbr_vecs=nbr_vecs, nbr_norms=nbr_norms,
    )

    d0 = gathered_distances(
        queries, data[jnp.clip(starts, 0, m - 1)][:, None, :],
        norms[jnp.clip(starts, 0, m - 1)][:, None], metric)[:, 0]
    meta = build_meta(nbrs, nbr_norms)
    f_ids, f_d, n_vis, cmps = pallas_beam_search_inline(
        nbr_vecs, meta, queries, starts, d0, active,
        beam=beam, limit=limit, metric=metric, interpret=True)

    np.testing.assert_array_equal(np.asarray(f_ids), np.asarray(
        ref.frontier_ids), err_msg="frontier ids diverge")
    np.testing.assert_array_equal(np.asarray(n_vis),
                                  np.asarray(ref.num_visited))
    np.testing.assert_array_equal(np.asarray(cmps), np.asarray(ref.dist_cmps))
    ref_d = np.asarray(ref.frontier_dists)
    got_d = np.asarray(f_d)
    fin = np.isfinite(ref_d)
    assert np.array_equal(fin, np.isfinite(got_d))
    np.testing.assert_allclose(got_d[fin], ref_d[fin], rtol=1e-6, atol=1e-5)


def test_pallas_beam_empty_and_inactive():
    """All-inactive queries return empty frontiers and zero counters."""
    rng = np.random.default_rng(0)
    m, r, w = 64, 5, 128
    _, _, nbrs, nbr_vecs, nbr_norms = _random_slab(rng, m, r, w)
    queries = jnp.zeros((QB, w), jnp.float32)
    starts = jnp.zeros((QB,), jnp.int32)
    d0 = jnp.zeros((QB,), jnp.float32)
    meta = build_meta(nbrs, nbr_norms)
    f_ids, f_d, n_vis, cmps = pallas_beam_search_inline(
        nbr_vecs, meta, queries, starts, d0,
        jnp.zeros((QB,), bool), beam=8, limit=100, metric="l2",
        interpret=True)
    assert (np.asarray(f_ids) == EMPTY_ID).all()
    assert not np.isfinite(np.asarray(f_d)).any()
    assert (np.asarray(n_vis) == 0).all()
    assert (np.asarray(cmps) == 0).all()

"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rangefilteredann_tpu.ops.bruteforce import scan_bruteforce
from rangefilteredann_tpu.ops.pallas_scan import pallas_scan_bruteforce
from rangefilteredann_tpu.utils.data import make_pointset, pad_queries


@pytest.mark.parametrize("metric", ["l2", "mips"])
@pytest.mark.parametrize("nq", [64, 512])  # 512 spans two query-grid blocks
def test_pallas_scan_matches_xla(rng, metric, nq):
    n, d, k = 1300, 24, 10  # n not a tile multiple on purpose
    points = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(points, metric)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    qp = jnp.asarray(pad_queries(queries, d, ps.d_pad))
    starts = rng.integers(0, n, size=nq).astype(np.int32)
    widths = rng.integers(0, n, size=nq)
    ends = np.minimum(starts + widths, n).astype(np.int32)
    ends[:4] = starts[:4]  # a few empty windows

    want_d, want_i = scan_bruteforce(
        ps.data, ps.norms_sq, qp, jnp.asarray(starts), jnp.asarray(ends),
        k=k, metric=metric,
    )
    got_d, got_i = pallas_scan_bruteforce(
        ps.data, ps.norms_sq, qp, jnp.asarray(starts), jnp.asarray(ends),
        k=k, metric=metric, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-4
    )


def test_pallas_scan_duplicate_points_ties(rng):
    """Exact (dist, id) tie order with duplicated points across tiles."""
    n, d, nq, k = 1536, 8, 64, 10
    base = rng.normal(size=(96, d)).astype(np.float32)
    points = np.tile(base, (16, 1))  # every point duplicated 16x across tiles
    ps = make_pointset(points, "l2")
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    qp = jnp.asarray(pad_queries(queries, d, ps.d_pad))
    starts = np.zeros(nq, dtype=np.int32)
    ends = np.full(nq, n, dtype=np.int32)
    want_d, want_i = scan_bruteforce(
        ps.data, ps.norms_sq, qp, jnp.asarray(starts), jnp.asarray(ends),
        k=k, metric="l2",
    )
    got_d, got_i = pallas_scan_bruteforce(
        ps.data, ps.norms_sq, qp, jnp.asarray(starts), jnp.asarray(ends),
        k=k, metric="l2", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_tournament_extraction_matches_simple(rng):
    """_extract_topk_tournament must be (dist, id)-order identical to
    _extract_topk, including duplicate distances and exhausted rows."""
    import jax
    from rangefilteredann_tpu.ops.pallas_scan import (
        EMPTY_ID, _extract_topk, _extract_topk_tournament)

    q, t, k = 32, 512, 10
    # heavy ties: few distinct values; some rows mostly empty
    d = rng.choice([0.0, 1.0, 2.0, np.inf], p=[.1, .2, .2, .5],
                   size=(q, t)).astype(np.float32)
    ids = np.where(np.isfinite(d), np.arange(t)[None, :], EMPTY_ID)
    ids = ids.astype(np.int32)
    d[0, :] = np.inf  # fully exhausted row
    ids[0, :] = EMPTY_ID
    a_d, a_i = jax.jit(lambda x, y: _extract_topk(x, y, k))(d, ids)
    b_d, b_i = jax.jit(lambda x, y: _extract_topk_tournament(x, y, k))(d, ids)
    assert np.array_equal(np.asarray(a_d), np.asarray(b_d))
    assert np.array_equal(np.asarray(a_i), np.asarray(b_i))


def test_host_max_tiles_grid_matches_full(rng):
    """A max_tiles-bounded grid must reproduce the full-grid scan exactly
    (host_max_tiles replicates the kernel's blocking math)."""
    from rangefilteredann_tpu.ops.pallas_scan import (
        host_max_tiles, pallas_scan_bruteforce)
    from rangefilteredann_tpu.utils.data import make_pointset, pad_queries

    n, d, q, k = 4096, 24, 256, 5
    pts = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(pts, "l2")
    queries = jnp.asarray(pad_queries(
        rng.normal(size=(q, d)).astype(np.float32), d, ps.d_pad))
    ss = rng.integers(0, n // 2, size=q).astype(np.int32)
    ee = (ss + rng.integers(600, n // 2, size=q)).astype(np.int32)
    mt = host_max_tiles(ss, ee, n, round_to=1)
    a = pallas_scan_bruteforce(ps.data, ps.norms_sq, queries,
                               jnp.asarray(ss), jnp.asarray(ee), k, "l2",
                               interpret=True)
    b = pallas_scan_bruteforce(ps.data, ps.norms_sq, queries,
                               jnp.asarray(ss), jnp.asarray(ee), k, "l2",
                               interpret=True, max_tiles=mt)
    assert mt < -(-n // 512)  # the bound actually bit (grid < n_tiles)
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))

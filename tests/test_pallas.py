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


def test_insert_round_matches_sorted_merge(rng):
    """_insert_round (the kernel's sorted-insert primitive) must reproduce a
    lexsort-by-(dist, insertion-order) oracle under heavy ties, partial rows
    (inf/EMPTY slots), and invalid candidates."""
    import jax
    from rangefilteredann_tpu.ops.pallas_scan import EMPTY_ID, _insert_round

    q, k, rounds = 64, 10, 30
    out_d = np.full((q, k), np.inf, dtype=np.float32)
    out_i = np.full((q, k), EMPTY_ID, dtype=np.int32)
    # oracle: per row, the list of accepted (dist, seq, id) sorted by
    # (dist, seq) — insertion puts equal dists after existing ones
    oracle = [[] for _ in range(q)]
    step = jax.jit(_insert_round)
    for r in range(rounds):
        cand_d = rng.choice([0.0, 1.0, 2.0, 3.5], size=q).astype(np.float32)
        cand_i = rng.integers(0, 10_000, size=q).astype(np.int32)
        valid = rng.uniform(size=q) < 0.7
        out_d, out_i = step(out_d, out_i, jnp.asarray(cand_d),
                            jnp.asarray(cand_i), jnp.asarray(valid))
        for row in range(q):
            if valid[row]:
                oracle[row].append((float(cand_d[row]), r, int(cand_i[row])))
                oracle[row].sort(key=lambda x: (x[0], x[1]))
                del oracle[row][k:]
    out_d, out_i = np.asarray(out_d), np.asarray(out_i)
    for row in range(q):
        want_d = [x[0] for x in oracle[row]] + [np.inf] * (k - len(oracle[row]))
        want_i = [x[2] for x in oracle[row]] + [EMPTY_ID] * (k - len(oracle[row]))
        np.testing.assert_array_equal(out_d[row], np.float32(want_d))
        np.testing.assert_array_equal(out_i[row], np.int32(want_i))


def test_host_max_tiles_grid_matches_full(rng):
    """A max_tiles-bounded grid must reproduce the full-grid scan exactly
    (host_max_tiles replicates the kernel's blocking math)."""
    from rangefilteredann_tpu.ops.pallas_scan import (
        host_max_tiles, pallas_scan_bruteforce)
    from rangefilteredann_tpu.utils.data import make_pointset, pad_queries

    n, d, q, k = 32768, 24, 256, 5
    pts = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(pts, "l2")
    queries = jnp.asarray(pad_queries(
        rng.normal(size=(q, d)).astype(np.float32), d, ps.d_pad))
    ss = rng.integers(0, n // 2, size=q).astype(np.int32)
    ee = (ss + rng.integers(600, n // 4, size=q)).astype(np.int32)
    mt = host_max_tiles(ss, ee, n, round_to=1, w_d=ps.d_pad)
    a = pallas_scan_bruteforce(ps.data, ps.norms_sq, queries,
                               jnp.asarray(ss), jnp.asarray(ee), k, "l2",
                               interpret=True)
    b = pallas_scan_bruteforce(ps.data, ps.norms_sq, queries,
                               jnp.asarray(ss), jnp.asarray(ee), k, "l2",
                               interpret=True, max_tiles=mt)
    from rangefilteredann_tpu.ops.pallas_scan import grid_params
    tile, _ = grid_params(ps.d_pad)  # kernel streams full d_pad (no d_eff)
    assert mt < -(-n // tile)  # the bound actually bit (grid < n_tiles)
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))

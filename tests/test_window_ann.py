"""`window_ann` drop-in surface (ref: python_bindings/python_bindings.cpp
:160-238): per-variant class names, defaults submodule, and integer-dtype
variants producing exact/near-exact results."""

import numpy as np
import pytest

import window_ann


def test_surface_names():
    for dt in ("Float", "Uint8", "Int8"):
        for m in ("Euclidian", "Mips"):
            for fam in (
                "PrefilterIndex", "PostfilterVamanaIndex",
                "RangeFilterTreeIndex", "VamanaRangeFilterTreeIndex",
                "SuperOptimizedPostfilterTreeIndex",
            ):
                assert hasattr(window_ann, f"{fam}{dt}{m}"), f"{fam}{dt}{m}"
            assert hasattr(window_ann, f"Vamana{dt}{m}Index")
    assert hasattr(window_ann, "build_vamana_float_euclidian_index")
    assert window_ann.defaults.METRIC == "Euclidian"
    assert window_ann.defaults.GRAPH_DEGREE == 64
    assert window_ann.defaults.ALPHA == 1.2
    assert window_ann.defaults.BEAMWIDTH == 128
    for name in ("QueryParams", "BuildParams", "QueryFilter", "csr_filters",
                 "FilteredDataset", "build_query_params"):
        assert hasattr(window_ann, name)


@pytest.mark.parametrize("dtype,cls", [
    (np.uint8, "PrefilterIndexUint8Euclidian"),
    (np.int8, "PrefilterIndexInt8Euclidian"),
])
def test_integer_prefilter_exact(rng, dtype, cls):
    n, d, nq, k = 3000, 32, 40, 5
    lo_v = 0 if dtype == np.uint8 else -100
    points = rng.integers(lo_v, 100, size=(n, d)).astype(dtype)
    labels = rng.uniform(size=n)
    queries = rng.integers(lo_v, 100, size=(nq, d)).astype(dtype)
    filters = np.stack([np.full(nq, 0.2), np.full(nq, 0.7)], 1)

    idx = getattr(window_ann, cls)(points, labels)
    qp = window_ann.build_query_params(k, k)
    ids, dists = idx.batch_search(queries.astype(np.float32), filters, nq, qp)

    order = np.argsort(labels, kind="stable")
    ls = labels[order]
    a, b = np.searchsorted(ls, 0.2), np.searchsorted(ls, 0.7)
    cand = order[a:b]
    cand_set = set(cand.tolist())
    for i in range(nq):
        diff = points[cand].astype(np.int64) - queries[i].astype(np.int64)
        dd = (diff * diff).sum(1)
        dd_of = dict(zip(cand.tolist(), dd.tolist()))
        # tie-aware exactness (integer points tie often; the session-scoped
        # rng makes the data order-dependent, so id sets are not stable):
        # every returned id must be an in-range candidate, and the returned
        # distance MULTISET must equal the true top-k multiset — the
        # reference's recall is tie-aware the same way
        # (check_nn_recall.h:85-108)
        got = [int(x) for x in ids[i]]
        assert len(got) == k and len(set(got)) == k
        assert set(got) <= cand_set
        got_dd = sorted(dd_of[g] for g in got)
        want_dd = sorted(dd.tolist())[:k]
        assert got_dd == want_dd


def test_int8_mips_postfilter_recall(rng):
    # zero-mean int8: inner products straddle 0, the regime the reference's
    # alpha-domination rule (index.h:99) is meaningful in. All-positive
    # unnormalized data degenerates MIPS pruning identically in the
    # reference; angular datasets are pre-normalized (run_our_method.py:218).
    n, d, nq, k = 4000, 24, 30, 5
    points = rng.integers(-50, 50, size=(n, d)).astype(np.int8)
    labels = rng.uniform(size=n)
    queries = rng.integers(-50, 50, size=(nq, d)).astype(np.float32)
    filters = np.stack([np.full(nq, 0.0), np.full(nq, 1.0)], 1)
    idx = window_ann.PostfilterVamanaIndexInt8Mips(
        points, labels, window_ann.BuildParams(16, 32, 1.2, ""),
    )
    ids, _ = idx.batch_search(
        queries, filters, nq, window_ann.build_query_params(k, 60, final_beam_multiply=2)
    )
    ips = queries @ points.astype(np.float32).T
    recall = np.mean([
        len(set(np.argsort(-ips[i])[:k].tolist())
            & set(int(x) for x in ids[i])) / k
        for i in range(nq)
    ])
    assert recall >= 0.8, recall


def test_speculative_doubling_matches_sequential(rng):
    """The round-1 speculative final pass + its reuse as the doubled-beam
    search (fm == 2) must be bit-identical to plain sequential doubling —
    the kernel is per-query deterministic, so this pins the host regrouping
    logic (round-3 change: spec results reused instead of relaunching)."""
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models import postfilter_vamana as pv

    n, d, k = 3000, 16, 10
    pts = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    idx = pv.PostfilterVamanaIndex(
        pts, labels, BuildParams(R=12, L=24, alpha=1.2), seed=2)
    nq = 48
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    # narrow windows force several doubling rounds; include a couple of
    # wide ones so round 1 also satisfies some queries
    widths = np.concatenate([np.full(40, 0.01), np.full(8, 0.5)])
    lo = rng.uniform(0, 0.4, size=nq)
    filters = np.stack([lo, lo + widths], 1)
    qp = build_query_params(k, 10, final_beam_multiply=2)
    assert pv.SPECULATE
    ids_a, d_a = idx.batch_search(queries, filters, nq, qp)
    pv.SPECULATE = False
    try:
        ids_b, d_b = idx.batch_search(queries, filters, nq, qp)
    finally:
        pv.SPECULATE = True
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_array_equal(d_a, d_b)

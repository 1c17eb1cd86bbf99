"""Golden exact-equality tests: PrefilterIndex == brute force.

The prefilter path is exact, so we demand id-for-id agreement with an
independent NumPy oracle (modulo distance ties), not just recall.
"""

import numpy as np
import pytest

from rangefilteredann_tpu import PrefilterIndex, build_query_params


def make_dataset(rng, n=2000, d=24):
    points = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    return points, labels


def make_queries(rng, labels, nq=50, d=24, fracs=(0.001, 0.01, 0.1, 0.5, 1.0)):
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    lo = np.sort(labels)[0]
    hi = np.sort(labels)[-1]
    filters = []
    for i in range(nq):
        frac = fracs[i % len(fracs)]
        width = (hi - lo) * frac
        start = rng.uniform(lo, max(lo, hi - width))
        filters.append((start, start + width))
    return queries, np.array(filters)


@pytest.mark.parametrize("metric", ["Euclidian", "mips"])
def test_prefilter_matches_bruteforce(rng, gt_fn, metric):
    points, labels = make_dataset(rng)
    queries, filters = make_queries(rng, labels)
    k = 10

    index = PrefilterIndex(points, labels, metric=metric)
    ids, dists = index.batch_search(queries, filters, len(queries), build_query_params(k, 10))

    m = "l2" if metric == "Euclidian" else "mips"
    gt_ids, gt_d = gt_fn(points, labels, queries, filters, k, m)

    for qi in range(len(queries)):
        got = ids[qi].astype(np.int64)
        want = gt_ids[qi]
        n_valid = int((want >= 0).sum())
        # Compare as sets up to distance ties at the k-th distance.
        got_valid = got[:n_valid]
        assert set(got_valid) - set(want[want >= 0]) == set() or np.allclose(
            np.sort(dists[qi][:n_valid]), np.sort(gt_d[qi][:n_valid]), rtol=1e-4, atol=1e-3
        ), f"query {qi}: got {got_valid}, want {want}"
        # Distances must match the oracle's to fp32 tolerance.
        finite = np.isfinite(gt_d[qi])
        assert np.allclose(dists[qi][finite], gt_d[qi][finite], rtol=1e-4, atol=1e-2)


def test_prefilter_empty_and_tiny_ranges(rng):
    points, labels = make_dataset(rng, n=500)
    queries = rng.normal(size=(3, 24)).astype(np.float32)
    # empty range (outside label support), single-point-ish range, full range
    filters = np.array([(2.0, 3.0), (labels[0], labels[0] + 1e-9), (0.0, 1.0)])
    index = PrefilterIndex(points, labels)
    ids, dists = index.batch_search(queries, filters, 3, build_query_params(10, 10))
    assert ids.shape == (3, 10)
    # empty range: all pads
    assert (dists[0] == np.finfo(np.float32).max).all()
    # full range returns k real results
    assert np.isfinite(dists[2]).sum() == 10 or (dists[2] < np.finfo(np.float32).max).all()


def test_prefilter_large_window_uses_scan(rng, gt_fn):
    # windows > WINDOW_GATHER_MAX exercise scan_bruteforce
    points, labels = make_dataset(rng, n=6000, d=16)
    queries = rng.normal(size=(8, 16)).astype(np.float32)
    filters = np.array([(0.0, 1.0)] * 8)  # full range > 4096 wide
    index = PrefilterIndex(points, labels)
    ids, dists = index.batch_search(queries, filters, 8, build_query_params(10, 10))
    gt_ids, gt_d = gt_fn(points, labels, queries, filters, 10, "l2")
    for qi in range(8):
        assert np.allclose(np.sort(dists[qi]), np.sort(gt_d[qi]), rtol=1e-4, atol=1e-2)


def test_batch_search_many_matches_per_batch(rng):
    """Pipelined multi-batch prefilter search must be bit-identical to
    per-batch calls (mixed small/large windows across batches)."""
    points, labels = make_dataset(rng, n=3000)
    index = PrefilterIndex(points, labels)
    qp = build_query_params(10, 10)
    batches = []
    for s in range(3):
        r = np.random.default_rng(50 + s)
        q = r.normal(size=(64, 24)).astype(np.float32)
        st = r.uniform(0, 0.5, size=64)
        wid = np.where(r.uniform(size=64) < 0.5, 0.002, 0.4)
        batches.append((q, np.stack([st, st + wid], 1)))
    singles = [index.batch_search(q, f, 64, qp) for q, f in batches]
    many = index.batch_search_many(batches, qp)
    for (i1, d1), (i2, d2) in zip(singles, many):
        assert np.array_equal(i1, i2)
        assert np.array_equal(d1, d2)


def test_sorted_labels_fast_path_identity(rng):
    """Pre-sorted labels (incl. ties) take the identity fast path; results
    must be identical to a shuffled copy of the same dataset."""
    n = 1200
    points = rng.normal(size=(n, 24)).astype(np.float32)
    labels = np.sort(np.round(rng.uniform(size=n), 2))  # sorted WITH ties
    queries = rng.normal(size=(16, 24)).astype(np.float32)
    st = rng.uniform(0, 0.6, size=16)
    filters = np.stack([st, st + 0.3], 1)
    qp = build_query_params(10, 10)
    a_ids, a_d = PrefilterIndex(points, labels).batch_search(
        queries, filters, 16, qp)
    perm = rng.permutation(n)
    b_ids, b_d = PrefilterIndex(points[perm], labels[perm]).batch_search(
        queries, filters, 16, qp)
    # distances identical; valid ids map back through the permutation
    assert np.array_equal(a_d, b_d)
    valid = a_d < np.finfo(np.float32).max
    assert np.array_equal(
        a_ids[valid].astype(np.int64),
        perm[b_ids[valid].astype(np.int64)])


def test_streaming_float_ingest_bit_identical(monkeypatch, rng):
    """Float stores above _STREAM_INGEST_BYTES upload in chunks (a single
    multi-GB device_put hangs the axon tunnel — round-3 finding). The
    streamed store must be BIT-identical to the single-put path: same host
    padding + np.einsum norms, only the transfer schedule differs."""
    import rangefilteredann_tpu.utils.data as D

    pts = rng.normal(size=(9000, 37)).astype(np.float32)
    want = D.make_pointset(pts, "l2")
    monkeypatch.setattr(D, "_STREAM_INGEST_BYTES", 100_000)
    got = D.make_pointset(pts, "l2")
    np.testing.assert_array_equal(np.asarray(want.data), np.asarray(got.data))
    np.testing.assert_array_equal(
        np.asarray(want.norms_sq), np.asarray(got.norms_sq))
    assert (want.n, want.d, want.norm_col) == (got.n, got.d, got.norm_col)

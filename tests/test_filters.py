"""csr_filters / QueryFilter / FilteredDataset (ref: utils/filters.h,
src/filtered_dataset.h) — roundtrip, transpose, joins, CAPS export."""

import numpy as np
import pytest

from rangefilteredann_tpu.filters import FilteredDataset, QueryFilter, csr_filters


def _dense_to_csr(dense: np.ndarray) -> csr_filters:
    offsets = np.zeros(dense.shape[0] + 1, dtype=np.int64)
    cols = []
    for p in range(dense.shape[0]):
        row = np.nonzero(dense[p])[0]
        cols.append(row)
        offsets[p + 1] = offsets[p] + len(row)
    return csr_filters.from_arrays(
        offsets, np.concatenate(cols).astype(np.int32), dense.shape[1]
    )


@pytest.fixture(scope="module")
def dense_and_csr():
    rng = np.random.default_rng(3)
    dense = rng.random((40, 13)) < 0.25
    dense[:, 0] |= ~dense.any(axis=1)  # every point has >= 1 filter
    return dense, _dense_to_csr(dense)


def test_match_and_counts(dense_and_csr):
    dense, cf = dense_and_csr
    assert cf.n_points == 40 and cf.n_filters == 13
    assert cf.n_nonzero == int(dense.sum())
    for p in range(0, 40, 7):
        for f in range(13):
            assert cf.match(p, f) == bool(dense[p, f])
        assert cf.point_count(p) == int(dense[p].sum())
        np.testing.assert_array_equal(cf.point_filters(p), np.nonzero(dense[p])[0])
    for f in range(0, 13, 3):
        assert cf.filter_count(f) == int(dense[:, f].sum())
    np.testing.assert_array_equal(cf.filter_counts(), dense.sum(axis=0))


def test_point_intersection(dense_and_csr):
    dense, cf = dense_and_csr
    got = cf.point_intersection(1, 2)
    np.testing.assert_array_equal(got, np.nonzero(dense[1] & dense[2])[0])


def test_transpose_and_query_matches(dense_and_csr):
    dense, cf = dense_and_csr
    t = cf.transpose()
    assert t.transposed and t.n_points == 13 and t.n_filters == 40
    for f in range(13):
        np.testing.assert_array_equal(t.point_filters(f), np.nonzero(dense[:, f])[0])
    # single and AND queries
    np.testing.assert_array_equal(
        t.query_matches(QueryFilter(4)), np.nonzero(dense[:, 4])[0]
    )
    np.testing.assert_array_equal(
        t.query_matches(QueryFilter(4, 7)), np.nonzero(dense[:, 4] & dense[:, 7])[0]
    )
    with pytest.raises(RuntimeError):
        cf.query_matches(QueryFilter(0))
    # double transpose round-trips
    tt = t.transpose()
    np.testing.assert_array_equal(tt.row_offsets, cf.row_offsets)
    np.testing.assert_array_equal(tt.row_indices, cf.row_indices)


def test_file_roundtrip(tmp_path, dense_and_csr):
    _, cf = dense_and_csr
    path = str(tmp_path / "filters.bin")
    cf.save(path)
    loaded = csr_filters(path)
    assert loaded.n_points == cf.n_points
    assert loaded.n_filters == cf.n_filters
    np.testing.assert_array_equal(loaded.row_offsets, cf.row_offsets)
    np.testing.assert_array_equal(loaded.row_indices, cf.row_indices)


def test_query_filter_semantics():
    assert not QueryFilter(5).is_and()
    assert QueryFilter(5, 6).is_and()
    assert QueryFilter(5).get_sequence() == [5]
    assert QueryFilter(5, 6).get_sequence() == [5, 6]
    assert "5" in repr(QueryFilter(5))


def test_filtered_dataset(tmp_path, dense_and_csr):
    dense, cf = dense_and_csr
    rng = np.random.default_rng(0)
    pts = rng.integers(-20, 20, size=(40, 8)).astype(np.int8)
    ppath = str(tmp_path / "points.bin")
    with open(ppath, "wb") as f:
        np.array([40, 8], dtype=np.uint32).tofile(f)
        pts.tofile(f)
    fpath = str(tmp_path / "filters.bin")
    cf.save(fpath)

    ds = FilteredDataset(ppath, fpath)
    assert ds.size() == 40
    assert ds.get_n_filters() == 13
    diff = pts[3].astype(np.int32) - pts[9].astype(np.int32)
    assert ds.distance(3, 9) == float((diff * diff).sum())
    assert ds.get_filter_size(2) == int(dense[:, 2].sum())
    assert ds.get_point_size(2) == int(dense[2].sum())
    np.testing.assert_array_equal(ds.get_filter_points(1), np.nonzero(dense[:, 1])[0])
    np.testing.assert_array_equal(
        ds.get_filter_intersection(0, 1), np.nonzero(dense[:, 0] & dense[:, 1])[0]
    )

    fvec = str(tmp_path / "out.fvec")
    ds.write_fvec(fvec)
    raw = np.fromfile(fvec, dtype=np.int32).reshape(40, 9)
    assert (raw[:, 0] == 8).all()
    np.testing.assert_array_equal(raw[:, 1:], pts.astype(np.int32))
    labels = str(tmp_path / "labels.txt")
    ds.write_labels(labels)
    assert open(labels).read().split()[:3] == ["0", "1", "2"]


def test_stats():
    from rangefilteredann_tpu.utils.stats import QueryStats, graph_stats

    st = QueryStats(4)
    st.increment_visited([0, 1, 1], [5, 2, 3])
    st.increment_dist(2, 10)
    avg, p99 = st.visited_stats()
    assert avg == pytest.approx((5 + 5 + 0 + 0) / 4)
    assert st.dist_stats()[0] == pytest.approx(2.5)
    nbrs = np.array([[1, 2, -1], [0, -1, -1]], dtype=np.int32)
    assert graph_stats(nbrs) == (1.5, 2)
    st.clear()
    assert st.visited_stats() == (0.0, 0.0)


def test_stats_wiring():
    """QueryStats accumulates real counters from an index search
    (ref: stats.h incremented at beamSearch.h:273,308-309)."""
    import numpy as np

    from rangefilteredann_tpu import (
        BuildParams, PostfilterVamanaIndex, QueryStats, build_query_params,
    )

    rng = np.random.default_rng(1)
    n, d, nq = 2000, 16, 20
    points = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    filters = np.stack([np.full(nq, 0.1), np.full(nq, 0.9)], 1)
    idx = PostfilterVamanaIndex(
        points, labels, BuildParams(R=16, L=32, alpha=1.2, cache_path=""),
    )
    st = QueryStats(nq)
    idx.batch_search(queries, filters, nq, build_query_params(5, 10), stats=st)
    assert (st.visited > 0).all()
    assert (st.distances > st.visited).all()  # each visit expands >1 neighbor
    avg, p99 = st.visited_stats()
    assert p99 >= avg > 0


def test_unsorted_rows_get_sorted():
    """The loader sorts each row's filter ids (ref: filters.h:105-107) —
    vectorized here; feed deliberately unsorted rows."""
    offsets = np.array([0, 3, 5, 5, 8], dtype=np.int64)
    cols = np.array([7, 2, 5, 9, 1, 6, 0, 3], dtype=np.int32)
    cf = csr_filters.from_arrays(offsets, cols, 10)
    np.testing.assert_array_equal(cf.point_filters(0), [2, 5, 7])
    np.testing.assert_array_equal(cf.point_filters(1), [1, 9])
    np.testing.assert_array_equal(cf.point_filters(2), [])
    np.testing.assert_array_equal(cf.point_filters(3), [0, 3, 6])
    assert cf.match(0, 5) and not cf.match(0, 4)

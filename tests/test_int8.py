"""Native int8/uint8 storage (reference Int8/Uint8 variants).

The reference stores bytes and computes integer distances
(ref: ParlayANN/algorithms/utils/euclidian_point.h:68-112). Here bytes stay
bytes in HBM (4x less than fp32 widening) and distance matmuls run as bf16
MXU passes, which are EXACT for byte values (ops/distances.mxu_operands) —
so every int8/uint8 result must match the fp32-widened computation bitwise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rangefilteredann_tpu import (
    BuildParams,
    PostfilterVamanaIndex,
    PrefilterIndex,
    RangeFilterTreeIndex,
    build_query_params,
)
from rangefilteredann_tpu.utils.data import make_pointset


@pytest.fixture(scope="module")
def int_data():
    rng = np.random.default_rng(11)
    n, d = 1500, 32
    pts_i8 = rng.integers(-100, 100, size=(n, d)).astype(np.int8)
    pts_u8 = rng.integers(0, 200, size=(n, d)).astype(np.uint8)
    labels = rng.uniform(size=n)
    nq = 64
    q_i8 = rng.integers(-100, 100, size=(nq, d)).astype(np.int8)
    q_u8 = rng.integers(0, 200, size=(nq, d)).astype(np.uint8)
    lo = rng.uniform(0, 0.6, size=nq)
    filters = np.stack([lo, lo + 0.3], axis=1)
    return pts_i8, pts_u8, labels, q_i8, q_u8, filters


def test_int_storage_dtype_and_layout(int_data):
    pts_i8, pts_u8, *_ = int_data
    ps = make_pointset(pts_i8, "l2")
    assert ps.data.dtype == jnp.int8
    assert ps.norm_col == -1
    assert ps.d_pad % 128 == 0
    ps_u = make_pointset(pts_u8, "mips")
    assert ps_u.data.dtype == jnp.uint8
    # norms exact; rows beyond n are scan-tile padding (zero vectors, norm 0)
    want = (pts_i8.astype(np.int64) ** 2).sum(1)
    norms = np.asarray(ps.norms_sq)
    np.testing.assert_array_equal(norms[: ps.n], want.astype(np.float32))
    assert (norms[ps.n:] == 0).all()


@pytest.mark.parametrize("dtype", ["int8", "uint8"])
@pytest.mark.parametrize("metric", ["Euclidian", "mips"])
def test_prefilter_int_matches_fp32(int_data, dtype, metric):
    pts_i8, pts_u8, labels, q_i8, q_u8, filters = int_data
    pts = pts_i8 if dtype == "int8" else pts_u8
    qs = q_i8 if dtype == "int8" else q_u8
    nq = len(qs)
    qp = build_query_params(10, 10)
    a = PrefilterIndex(pts, labels, metric=metric)
    b = PrefilterIndex(pts.astype(np.float32), labels, metric=metric)
    ids_a, d_a = a.batch_search(qs.astype(np.float32), filters, nq, qp)
    ids_b, d_b = b.batch_search(qs.astype(np.float32), filters, nq, qp)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6, atol=1e-3)


def test_postfilter_int8_graph_and_results_match_fp32(int_data):
    """Exact integer distances => the Vamana build makes identical decisions
    => identical graphs and identical search results vs the widened build."""
    pts_i8, _, labels, q_i8, _, filters = int_data
    nq = len(q_i8)
    bp = BuildParams(R=12, L=24, alpha=1.2)
    a = PostfilterVamanaIndex(pts_i8, labels, bp)
    b = PostfilterVamanaIndex(pts_i8.astype(np.float32), labels, bp)
    assert a._ps.data.dtype == jnp.int8
    np.testing.assert_array_equal(a._graph.nbrs_host, b._graph.nbrs_host)
    qp = build_query_params(10, 20, final_beam_multiply=2)
    ids_a, d_a = a.batch_search(q_i8.astype(np.float32), filters, nq, qp)
    ids_b, d_b = b.batch_search(q_i8.astype(np.float32), filters, nq, qp)
    np.testing.assert_array_equal(ids_a, ids_b)


def test_tree_uint8_recall(int_data, gt_fn=None):
    """B-WST over a uint8 store: end-to-end recall against a fp64 oracle."""
    pts_i8, pts_u8, labels, q_i8, q_u8, filters = int_data
    nq = len(q_u8)
    tree = RangeFilterTreeIndex(
        pts_u8, labels, cutoff=400, split_factor=2,
        build_params=BuildParams(R=12, L=24, alpha=1.2),
    )
    qp = build_query_params(10, 32, final_beam_multiply=2)
    ids, _ = tree.batch_search(q_u8.astype(np.float32), filters, nq,
                               "optimized_postfilter", qp)
    # fp64 oracle
    order = np.argsort(labels, kind="stable")
    ls = labels[order]
    x = pts_u8[order].astype(np.float64)
    q = q_u8.astype(np.float64)
    ss = np.searchsorted(ls, filters[:, 0])
    ee = np.searchsorted(ls, filters[:, 1])
    rec = []
    for r in range(nq):
        d = ((x - q[r]) ** 2).sum(1)
        m = np.full(len(x), np.inf)
        m[ss[r]:ee[r]] = d[ss[r]:ee[r]]
        o = order[np.argsort(m, kind="stable")[:10]]
        got = set(ids[r].astype(np.int64).tolist())
        rec.append(len(got & set(o.tolist())) / 10)
    assert np.mean(rec) > 0.85, np.mean(rec)


def test_window_ann_int_variants_build():
    import window_ann as wa

    rng = np.random.default_rng(3)
    pts = rng.integers(0, 200, size=(400, 16)).astype(np.uint8)
    labels = rng.uniform(size=400)
    idx = wa.PrefilterIndexUint8Euclidian(pts, labels)
    assert idx._ps.data.dtype == jnp.uint8
    idx2 = wa.PostfilterVamanaIndexInt8Mips(
        (rng.integers(-100, 100, size=(400, 16))).astype(np.int8), labels,
        BuildParams(R=8, L=16, alpha=1.2, cache_path=""))
    assert idx2._ps.data.dtype == jnp.int8


def test_streaming_ingest_matches_reference_layout(rng):
    """The device-chunk-assembled integer store must equal the padded host
    layout bit-for-bit, and its norms the exact integer square-sums (incl.
    values near the fp32 rounding edge at d=512)."""
    from rangefilteredann_tpu.utils.data import make_pointset

    n, d = 700, 512  # d=512: norms ~3e7, past 2^24 (fp32 rounding edge)
    pts = rng.integers(0, 256, size=(n, d)).astype(np.uint8)
    ps = make_pointset(pts, "Euclidian")
    host = np.asarray(ps.data)
    assert host.dtype == np.uint8
    assert np.array_equal(host[:n, :d], pts)
    assert (host[n:] == 0).all() and (host[:, d:] == 0).all()
    want = (pts.astype(np.int64) ** 2).sum(axis=1).astype(np.float32)
    assert np.array_equal(np.asarray(ps.norms_sq)[:n], want)
    assert (np.asarray(ps.norms_sq)[n:] == 0).all()

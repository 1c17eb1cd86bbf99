"""Device query-cache behaviors (models/base): key reuse and fill dedup.

The cache memoizes the padded query matrix on device (CLAUDE.md "Tunnel
economics": re-uploading ~5 MB costs 50-70 ms on the remote link). These
tests pin the two host-side contracts added by the round-2 review:
  - a precomputed q_key must yield identical results to hashing in-call,
  - a batch_search_many stream repeating one batch must fill the cache ONCE
    (every launch records a miss before any fill runs; un-guarded puts would
    enqueue duplicate full-matrix uploads).
"""

import numpy as np
import pytest

from rangefilteredann_tpu.models import base
from rangefilteredann_tpu.utils.data import make_pointset, pad_queries


@pytest.fixture()
def small_store(rng):
    pts = rng.normal(size=(512, 24)).astype(np.float32)
    ps = make_pointset(pts, "l2")
    q = rng.normal(size=(40, 24)).astype(np.float32)
    qpad = pad_queries(q, 24, ps.d_pad)
    starts = rng.integers(0, 200, size=40).astype(np.int64)
    ends = starts + rng.integers(1, 300, size=40).astype(np.int64)
    return ps, qpad, starts, ends


def test_precomputed_qkey_parity(small_store):
    ps, qpad, starts, ends = small_store
    base._QCACHE.clear()
    d0, i0 = base.batched_range_bruteforce(
        ps.data, ps.norms_sq, qpad, starts, ends, 5, "l2",
        norm_col=ps.norm_col)
    base._QCACHE.clear()
    d1, i1 = base.batched_range_bruteforce(
        ps.data, ps.norms_sq, qpad, starts, ends, 5, "l2",
        norm_col=ps.norm_col, q_key=base._qkey(qpad))
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(d0, d1)


def test_finish_many_fills_cache_once(small_store, monkeypatch):
    ps, qpad, starts, ends = small_store
    base._QCACHE.clear()
    puts = []
    orig_put = base._qcache_put

    def counting_put(key, q):
        puts.append(key)
        return orig_put(key, q)

    monkeypatch.setattr(base, "_qcache_put", counting_put)
    launches = [
        base.launch_range_bruteforce(
            ps.data, ps.norms_sq, qpad, starts, ends, 5, "l2",
            norm_col=ps.norm_col)
        for _ in range(3)
    ]
    outs = base.finish_many_range_bruteforce(launches)
    assert len(puts) == 1  # duplicate-fill guard: one upload for the stream
    assert len(base._QCACHE) == 1
    for d, i in ((o[0], o[1]) for o in outs):
        np.testing.assert_array_equal(i, outs[0][1])
        np.testing.assert_array_equal(d, outs[0][0])


def test_qcache_fill_hits_after_fill(small_store):
    ps, qpad, _, _ = small_store
    base._QCACHE.clear()
    k1, dev1 = base.qcache_fill(qpad)
    k2, dev2 = base.qcache_fill(qpad, k1)
    assert k1 == k2
    assert dev1 is dev2  # second call is a pure cache hit


def test_qkey_is_content_digest(small_store):
    """Round-3 hardening (VERDICT weak #5): the key is a real digest of the
    bytes, so batches that defeated the old crc32+sum key (equal shape,
    equal float sum, permuted content) get distinct keys."""
    ps, qpad, _, _ = small_store
    permuted = qpad[::-1].copy()          # same multiset -> identical sum
    assert float(permuted.sum(dtype=np.float64)) == pytest.approx(
        float(qpad.sum(dtype=np.float64)))
    assert base._qkey(qpad) != base._qkey(permuted)
    # sign-cancelled perturbation: add +x to one row, -x to another
    twiddled = qpad.copy()
    twiddled[0, 0] += 1.0
    twiddled[1, 0] -= 1.0
    assert base._qkey(qpad) != base._qkey(twiddled)
    # determinism: same bytes -> same key
    assert base._qkey(qpad) == base._qkey(qpad.copy())


def test_stale_qkey_shape_rejected(small_store):
    """Advisor finding (round 2): a q_key computed from a different matrix
    must not be trusted — the shape component is cross-checked."""
    ps, qpad, starts, ends = small_store
    other = np.zeros((8, qpad.shape[1]), np.float32)
    stale = base._qkey(other)
    with pytest.raises(ValueError, match="q_key"):
        base.batched_range_bruteforce(
            ps.data, ps.norms_sq, qpad, starts, ends, 5, "l2",
            norm_col=ps.norm_col, q_key=stale)
    with pytest.raises(ValueError, match="q_key"):
        base.qcache_fill(qpad, stale)

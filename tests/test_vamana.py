"""Vamana build quality + RobustPrune oracle tests + postfilter index recall."""

import numpy as np
import jax.numpy as jnp
import pytest

from rangefilteredann_tpu import BuildParams, build_query_params
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex
from rangefilteredann_tpu.models.vamana import build_vamana_graph
from rangefilteredann_tpu.models.vamana_index import VamanaIndex
from rangefilteredann_tpu.ops.robust_prune import robust_prune
from rangefilteredann_tpu.utils.data import make_pointset
from .oracle import robust_prune_oracle


def test_robust_prune_matches_oracle(rng):
    n, d, C, R = 200, 8, 32, 8
    points = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(points, "l2")
    s2g = jnp.arange(n, dtype=jnp.int32)
    m = 16
    p_slab = rng.choice(n, size=m, replace=False).astype(np.int32)
    cand = np.stack([rng.choice(n, size=C, replace=False) for _ in range(m)]).astype(np.int32)
    ids, dists = robust_prune(
        ps.data, ps.norms_sq, s2g, jnp.asarray(p_slab), jnp.asarray(cand),
        jnp.float32(1.2), R=R, metric="l2", norm_col=ps.norm_col,
    )
    for i in range(m):
        cand_dists = [
            (int(c), float(np.dot(points[p_slab[i]] - points[c], points[p_slab[i]] - points[c])))
            for c in cand[i]
        ]
        want = robust_prune_oracle(int(p_slab[i]), cand_dists, points, 1.2, R, "l2")
        got = [int(x) for x in np.asarray(ids[i]) if x >= 0]
        assert got == want, f"row {i}: {got} vs {want}"


def test_vamana_build_unfiltered_recall(rng):
    n, d, k = 2000, 32, 10
    points = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(points, "l2")
    bp = BuildParams(R=32, L=64, alpha=1.2)
    g = build_vamana_graph(ps, np.arange(n, dtype=np.int64), np.array([0, n]), bp, seed=1)
    # degree bound respected
    assert ((g.nbrs_host >= 0).sum(axis=1) <= bp.R).all()
    # no self-edges
    self_edge = g.nbrs_host == np.arange(n)[:, None]
    assert not self_edge.any()

    idx = VamanaIndex.from_arrays(points, g.nbrs_host, metric="Euclidian")
    queries = rng.normal(size=(100, d)).astype(np.float32)
    ids, dists = idx.batch_search(queries, 100, k, beam_width=60)
    gt = np.argsort(((points[None] - queries[:, None]) ** 2).sum(-1), axis=1)[:, :k]
    recall = np.mean([
        len(set(ids[i].astype(int)) & set(gt[i])) / k for i in range(100)
    ])
    assert recall > 0.9, f"unfiltered vamana recall {recall}"


def test_multibucket_build_stays_in_buckets(rng):
    """A row of several buckets built at once: edges must stay intra-bucket."""
    n, d = 1200, 16
    points = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(points, "l2")
    offsets = np.array([0, 300, 600, 900, 1200])
    bp = BuildParams(R=16, L=32, alpha=1.2)
    g = build_vamana_graph(ps, np.arange(n, dtype=np.int64), offsets, bp, seed=2)
    bucket_of = np.searchsorted(offsets, np.arange(n), side="right") - 1
    rows = np.repeat(np.arange(n), g.nbrs_host.shape[1])
    flat = g.nbrs_host.reshape(-1)
    ok = flat >= 0
    assert (bucket_of[rows[ok]] == bucket_of[flat[ok]]).all()
    # every bucket's nodes have some edges
    deg = (g.nbrs_host >= 0).sum(1)
    for b in range(4):
        assert deg[offsets[b]:offsets[b + 1]].mean() > 4


@pytest.mark.parametrize("metric", ["Euclidian", "mips"])
def test_postfilter_vamana_recall(rng, gt_fn, metric):
    n, d, k = 3000, 24, 10
    points = rng.normal(size=(n, d)).astype(np.float32)
    if metric == "mips":
        points /= np.linalg.norm(points, axis=1, keepdims=True)
    labels = rng.uniform(size=n)
    idx = PostfilterVamanaIndex(
        points, labels, BuildParams(R=32, L=64, alpha=1.2), metric=metric
    )
    nq = 60
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    if metric == "mips":
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    # wide-ish ranges where postfiltering is sane (fraction 1/4)
    starts_f = rng.uniform(0, 0.75, size=nq)
    filters = np.stack([starts_f, starts_f + 0.25], axis=1)
    qp = build_query_params(k, 40, final_beam_multiply=4)
    ids, dists = idx.batch_search(queries, filters, nq, qp)
    m = "l2" if metric == "Euclidian" else "mips"
    gt_ids, _ = gt_fn(points, labels, queries, filters, k, m)
    recall = np.mean([
        len(set(ids[i].astype(int)) & set(gt_ids[i][gt_ids[i] >= 0].astype(int)))
        / max((gt_ids[i] >= 0).sum(), 1)
        for i in range(nq)
    ])
    assert recall > 0.85, f"postfilter recall {recall} ({metric})"


def test_postfilter_medoid_start(rng, gt_fn):
    """start_point='medoid' (round-3 verdict item 5): starts every search at
    the centroid-closest point instead of vertex 0. Query-time-only knob —
    same graph, recall must stay in the same band as zero-start."""
    n, d, k, nq = 2000, 16, 10, 40
    points = rng.normal(size=(n, d)).astype(np.float32)
    points /= np.linalg.norm(points, axis=1, keepdims=True)
    labels = rng.uniform(size=n)
    bp = BuildParams(R=24, L=48, alpha=1.2)
    idx0 = PostfilterVamanaIndex(points, labels, bp, metric="mips")
    idxm = PostfilterVamanaIndex(points, labels, bp, metric="mips",
                                 start_point="medoid")
    assert idxm._start != 0 or idx0._start == idxm._start
    # medoid = centroid-closest in label-sorted order
    srt = points[np.argsort(labels, kind="stable")]
    mean = srt.astype(np.float64).mean(axis=0)
    d2 = np.einsum("ij,ij->i", srt, srt) - 2.0 * (srt @ mean)
    assert idxm._start == int(np.argmin(d2))
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    starts_f = rng.uniform(0, 0.75, size=nq)
    filters = np.stack([starts_f, starts_f + 0.25], axis=1)
    qp = build_query_params(k, 40, final_beam_multiply=4)
    gt_ids, _ = gt_fn(points, labels, queries, filters, k, "mips")

    def rec(ids):
        return np.mean([
            len(set(ids[i].astype(int))
                & set(gt_ids[i][gt_ids[i] >= 0].astype(int)))
            / max((gt_ids[i] >= 0).sum(), 1) for i in range(nq)])

    ids0, _ = idx0.batch_search(queries, filters, nq, qp)
    idsm, _ = idxm.batch_search(queries, filters, nq, qp)
    r0, rm = rec(ids0), rec(idsm)
    assert rm > 0.8 and rm >= r0 - 0.05, (rm, r0)

    with pytest.raises(ValueError):
        PostfilterVamanaIndex(points, labels, bp, start_point="nope")


def test_postfilter_beam_at_clamp_still_searches(rng, gt_fn, monkeypatch):
    """A requested beamSize at/above MAX_SAFE_BEAM must still run one search
    AT the clamp (do-while semantics, ref postfilter_vamana.h:161-172) — the
    round-1 code marked such queries done before any search and returned
    all-empty results (advisor finding, medium)."""
    from rangefilteredann_tpu.models import postfilter_vamana as pv

    monkeypatch.setattr(pv, "MAX_SAFE_BEAM", 32)
    n, d, k = 1200, 16, 10
    points = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    idx = PostfilterVamanaIndex(points, labels, BuildParams(R=16, L=32, alpha=1.2))
    nq = 16
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    starts_f = rng.uniform(0, 0.5, size=nq)
    filters = np.stack([starts_f, starts_f + 0.5], axis=1)
    qp = build_query_params(k, 64, final_beam_multiply=4)  # beam 64 > clamp 32
    ids, dists = idx.batch_search(queries, filters, nq, qp)
    # every query has a wide window: results must be non-empty and sane
    assert (dists[:, 0] < np.finfo(np.float32).max).all()
    gt_ids, _ = gt_fn(points, labels, queries, filters, k, "l2")
    recall = np.mean([
        len(set(ids[i].astype(int)) & set(gt_ids[i][gt_ids[i] >= 0].astype(int)))
        / max((gt_ids[i] >= 0).sum(), 1)
        for i in range(nq)
    ])
    assert recall > 0.5, f"clamped-beam recall {recall}"


def test_postfilter_exact_tail_beyond_safe_beam(rng, gt_fn, monkeypatch):
    """Queries whose doubling exhausts MAX_SAFE_BEAM while
    postfiltering_max_beam allows more must take the exact-scan tail and
    return the EXACT window top-k (closing the reference's max_beam=10000
    semantics, postfilter_vamana.h:161-181, with strictly better results)."""
    from rangefilteredann_tpu.models import postfilter_vamana as pv

    monkeypatch.setattr(pv, "MAX_SAFE_BEAM", 16)
    n, d, k = 1500, 16, 10
    points = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    idx = PostfilterVamanaIndex(points, labels, BuildParams(R=16, L=32, alpha=1.2))
    nq = 24
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    # windows narrower than k points: doubling can NEVER satisfy, so every
    # query hits the cap and takes the exact tail
    starts_f = rng.uniform(0.05, 0.9, size=nq)
    width = (k - 2) / n  # ~8 points per window
    filters = np.stack([starts_f, starts_f + width], axis=1)
    qp = build_query_params(k, 10, final_beam_multiply=2)  # max_beam 10000
    ids, dists = idx.batch_search(queries, filters, nq, qp)
    gt_ids, gt_d = gt_fn(points, labels, queries, filters, k, "l2")
    for i in range(nq):
        want = set(gt_ids[i][gt_ids[i] >= 0].astype(int))
        got = set(ids[i][np.isfinite(
            np.where(dists[i] < 3e38, dists[i], np.inf))].astype(int))
        assert got == want, f"query {i}: {got} vs {want}"
    # negative control: with the caller's cap equal to the clamp, the tail
    # must NOT run (reference parity: partial approximate results are legal)
    qp2 = build_query_params(k, 10, final_beam_multiply=2,
                             postfiltering_max_beam=16)
    ids2, _ = idx.batch_search(queries, filters, nq, qp2)
    assert ids2.shape == (nq, k)


def test_padded_slab_build_identical(rng):
    """build_vamana_graph with pad_rows/insert_pad must produce EXACTLY the
    same graph on the real rows as the unpadded build (pad rows are isolated)
    — this is what lets all super-tree rows share one compiled shape."""
    from rangefilteredann_tpu.models.vamana import build_vamana_graph

    n, d = 700, 12
    points = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(points, "l2")
    offsets = np.array([0, 300, 700], dtype=np.int64)
    s2g = np.arange(n, dtype=np.int64)
    bp = BuildParams(R=8, L=16, alpha=1.2, cache_path="")
    a = build_vamana_graph(ps, s2g, offsets, bp, seed=3)
    b = build_vamana_graph(ps, s2g, offsets, bp, seed=3, pad_rows=1024,
                           insert_pad=128)
    assert b.nbrs_host.shape[0] == 1024
    assert np.array_equal(a.nbrs_host, b.nbrs_host[:n])
    assert (b.nbrs_host[n:] == -1).all()


def test_reverse_edges_match_groupby_oracle(rng):
    """The on-device reverse-edge bookkeeping (sort + segmented ranks +
    cond-gated overfull prune) must match a NumPy group-by-key oracle that
    replicates the reference's batch_insert phase 2/3 (ref: index.h:279-306),
    sharing the same robust_prune op for the overfull re-prunes."""
    import functools
    import jax

    from rangefilteredann_tpu.models.vamana import _apply_reverse_edges

    n, d, R, mp = 300, 8, 6, 64
    rev_cap = 16
    points = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(points, "l2")
    s2g = jnp.arange(n, dtype=jnp.int32)
    alpha = jnp.float32(1.1)

    # adjacency with random fill levels, inserts with partially padded rows
    nbrs = np.full((n, R), -1, dtype=np.int32)
    for i in range(n):
        deg = rng.integers(0, R + 1)
        if deg:
            nbrs[i, :deg] = rng.choice(n, size=deg, replace=False)
    degrees = (nbrs >= 0).sum(axis=1).astype(np.int32)
    mb = 50
    ins = np.full((mp,), n, dtype=np.int32)
    ins[:mb] = rng.choice(n, size=mb, replace=False)
    new_out = np.full((mp, R), -1, dtype=np.int32)
    for i in range(mb):
        deg = rng.integers(1, R + 1)
        new_out[i, :deg] = rng.choice(n, size=deg, replace=False)

    fn = functools.partial(
        _apply_reverse_edges, R=R, metric="l2", chunk=16, rev_cap=rev_cap,
        norm_col=ps.norm_col)
    got_n, got_d = jax.jit(fn)(
        jnp.asarray(nbrs), jnp.asarray(degrees), ps.data, ps.norms_sq, s2g,
        jnp.asarray(ins), jnp.asarray(new_out), alpha)
    got_n, got_d = np.asarray(got_n), np.asarray(got_d)

    # ---- oracle: stable group-by-target, append or re-prune ----
    want_n, want_d = nbrs.copy(), degrees.copy()
    u = np.repeat(ins, R)
    v = new_out.reshape(-1)
    ok = v >= 0
    u, v = u[ok], v[ok]
    order = np.argsort(v, kind="stable")
    u, v = u[order], v[order]
    uniq, seg_starts, counts = np.unique(v, return_index=True,
                                         return_counts=True)
    for tgt, s0, c in zip(uniq, seg_starts, counts):
        srcs = u[s0 : s0 + c]
        if want_d[tgt] + c <= R:
            want_n[tgt, want_d[tgt] : want_d[tgt] + c] = srcs
            want_d[tgt] += c
        else:
            cand = np.full((1, rev_cap), -1, dtype=np.int32)
            cand[0, : want_d[tgt]] = want_n[tgt, : want_d[tgt]]
            keep = srcs[: rev_cap - R]
            cand[0, R : R + len(keep)] = keep
            pruned, _ = robust_prune(
                ps.data, ps.norms_sq, s2g,
                jnp.asarray([tgt], dtype=jnp.int32), jnp.asarray(cand),
                alpha, R=R, metric="l2", norm_col=ps.norm_col)
            want_n[tgt] = np.asarray(pruned)[0]
            want_d[tgt] = (want_n[tgt] >= 0).sum()

    assert np.array_equal(got_d, want_d)
    assert np.array_equal(got_n, want_n)


def test_require_cache_guard(tmp_path, rng):
    """require_cache must load an existing, fingerprint-matching cache and
    raise (never cold-build) when the cache is absent or the data drifted
    (round-3 review: a generator drift is invisible to filename probes and
    would otherwise trigger an unbounded cold build in bounded callers)."""
    import pytest

    from rangefilteredann_tpu import BuildParams
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)

    n, d = 1500, 16
    points = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.uniform(size=n)
    bp = BuildParams(R=8, L=16, alpha=1.2, cache_path=str(tmp_path) + "/")

    with pytest.raises(FileNotFoundError):
        PostfilterVamanaIndex(points, labels, bp, require_cache=True)

    built = PostfilterVamanaIndex(points, labels, bp)  # writes the cache
    loaded = PostfilterVamanaIndex(points, labels, bp, require_cache=True)
    np.testing.assert_array_equal(
        loaded._graph.nbrs_host, built._graph.nbrs_host)

    # same shapes + label range, different content -> fingerprint mismatch.
    # Drift EVERY point: the fingerprint samples rows, so a single-point
    # drift can dodge it (it did, under the session-scoped rng's
    # order-dependent data).
    drifted = points + 1.0
    with pytest.raises(FileNotFoundError):
        PostfilterVamanaIndex(drifted, labels, bp, require_cache=True)


def test_build_checkpoint_resume(rng, tmp_path, monkeypatch):
    """A build killed mid-loop and resumed from its step checkpoint must
    produce EXACTLY the graph of an uninterrupted build: resume re-derives
    the rng stream (perms/schedules) from the seed and replays from the
    first un-checkpointed step. Guards the multi-hour 10M+ flat builds
    against machine resets (the reference's resume unit is the whole cached
    graph, ref: src/postfilter_vamana.h:54-79 — too coarse for one slab)."""
    import os

    import rangefilteredann_tpu.models.vamana as vm

    n, d = 1500, 16
    points = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(points, "l2")
    bp = BuildParams(R=16, L=32, alpha=1.2)
    s2g = np.arange(n, dtype=np.int64)
    offsets = np.array([0, n])
    ref = build_vamana_graph(ps, s2g, offsets, bp, seed=7)

    ckpt = str(tmp_path / "g.ckpt.npz")
    monkeypatch.setenv("RFANN_CKPT_SECS", "0")  # checkpoint every step

    real_step = vm._insert_step
    calls = {"n": 0}

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated TPU worker fault")
        return real_step(*a, **k)

    monkeypatch.setattr(vm, "_insert_step", bomb)
    with pytest.raises(RuntimeError):
        build_vamana_graph(ps, s2g, offsets, bp, seed=7,
                           checkpoint_path=ckpt)
    monkeypatch.setattr(vm, "_insert_step", real_step)
    assert os.path.exists(ckpt)
    saved = np.load(ckpt)
    assert 0 < int(saved["t_done"])

    resumed = build_vamana_graph(ps, s2g, offsets, bp, seed=7,
                                 checkpoint_path=ckpt)
    assert not os.path.exists(ckpt)  # deleted on completion
    np.testing.assert_array_equal(resumed.nbrs_host, ref.nbrs_host)

    # a stale checkpoint from DIFFERENT build inputs must be ignored
    np.savez(ckpt, fingerprint=np.int64(0), t_done=saved["t_done"],
             nbrs=saved["nbrs"], degrees=saved["degrees"])
    fresh = build_vamana_graph(ps, s2g, offsets, bp, seed=7,
                               checkpoint_path=ckpt)
    np.testing.assert_array_equal(fresh.nbrs_host, ref.nbrs_host)

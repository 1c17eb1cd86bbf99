"""Beam search kernel vs the NumPy oracle.

Without cut pruning the TPU kernel's exact-frontier-dedup semantics provably
match the oracle's exact-seen-set semantics (a node dropped from a full
frontier can never re-enter), so we require exact frontier equality. With cut
pruning the two may diverge on re-proposals, so we check near-equality.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rangefilteredann_tpu.ops.beam_search import batched_beam_search
from rangefilteredann_tpu.utils.data import make_pointset, pad_queries
from .oracle import beam_search_oracle, random_graph


def setup(rng, n=300, d=16, r=8, metric="l2"):
    points = rng.normal(size=(n, d)).astype(np.float32)
    nbrs = random_graph(rng, n, r)
    ps = make_pointset(points, metric)
    s2g = jnp.arange(n, dtype=jnp.int32)
    return points, nbrs, ps, s2g


@pytest.mark.parametrize("metric", ["l2", "mips"])
@pytest.mark.parametrize("beam", [4, 16])
def test_exact_match_no_cut(rng, metric, beam):
    points, nbrs, ps, s2g = setup(rng, metric=metric)
    nq = 20
    queries = rng.normal(size=(nq, 16)).astype(np.float32)
    qp = jnp.asarray(pad_queries(queries, 16, ps.d_pad))
    starts = jnp.zeros(nq, jnp.int32)

    res = batched_beam_search(
        ps.data, ps.norms_sq, jnp.asarray(nbrs), s2g, qp, starts,
        beam=beam, k=0, cut=jnp.float32(10.0), limit=jnp.int32(10_000),
        metric=metric, return_visited=True, visited_cap=400,
    )
    for qi in range(nq):
        frontier, visited, cmps = beam_search_oracle(
            queries[qi], nbrs, points, 0, beam,
            k=0, cut=10.0, limit=10_000, metric=metric,
        )
        got_ids = np.asarray(res.frontier_ids[qi])
        got_d = np.asarray(res.frontier_dists[qi])
        want_ids = np.array([e[0] for e in frontier])
        want_d = np.array([e[1] for e in frontier])
        nv = len(want_ids)
        assert (got_ids[:nv] == want_ids).all(), f"q{qi}: {got_ids[:nv]} vs {want_ids}"
        # l2 oracle computes true dists; kernel returns shifted (missing ||q||^2)
        shift = float(np.dot(queries[qi], queries[qi])) if metric == "l2" else 0.0
        np.testing.assert_allclose(got_d[:nv] + shift, want_d, rtol=1e-4, atol=1e-3)
        # visit order must match too
        want_vis = [e[0] for e in visited]
        got_vis = np.asarray(res.visited_ids[qi])[: len(want_vis)]
        assert (got_vis == want_vis).all()
        assert int(res.num_visited[qi]) == len(want_vis)


def test_limit_respected(rng):
    points, nbrs, ps, s2g = setup(rng)
    queries = rng.normal(size=(4, 16)).astype(np.float32)
    qp = jnp.asarray(pad_queries(queries, 16, ps.d_pad))
    res = batched_beam_search(
        ps.data, ps.norms_sq, jnp.asarray(nbrs), s2g, qp,
        jnp.zeros(4, jnp.int32), beam=8, k=0, cut=jnp.float32(10.0),
        limit=jnp.int32(5), metric="l2",
    )
    assert (np.asarray(res.num_visited) <= 5).all()


def knn_graph(points, r):
    """Navigable test graph: edges to the r nearest neighbors + a ring."""
    n = len(points)
    d = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, : r - 1]
    nbrs = np.concatenate([((np.arange(n) + 1) % n)[:, None], nn], axis=1)
    return nbrs.astype(np.int32)


def test_cut_pruning_recall_matches_oracle(rng):
    """With cut pruning the kernel and oracle may walk different paths after a
    frontier shrink (no global seen-set vs exact seen-set); what must hold is
    that recall vs ground truth is as good as the oracle's, on a navigable
    (kNN) graph like the real Vamana graphs it will search."""
    n, dim, k = 500, 16, 5
    points = rng.normal(size=(n, dim)).astype(np.float32)
    nbrs = knn_graph(points, 8)
    ps = make_pointset(points, "l2")
    s2g = jnp.arange(n, dtype=jnp.int32)
    nq = 32
    queries = rng.normal(size=(nq, dim)).astype(np.float32)
    qp = jnp.asarray(pad_queries(queries, dim, ps.d_pad))
    res = batched_beam_search(
        ps.data, ps.norms_sq, jnp.asarray(nbrs), s2g, qp,
        jnp.zeros(nq, jnp.int32), beam=16, k=k, cut=jnp.float32(1.35),
        limit=jnp.int32(10_000), metric="l2",
        q_norms_sq=jnp.asarray(np.einsum("qd,qd->q", queries, queries)),
    )
    gt = np.argsort(((points[None] - queries[:, None]) ** 2).sum(-1), axis=1)[:, :k]
    kernel_hits = oracle_hits = 0
    for qi in range(nq):
        frontier, _, _ = beam_search_oracle(
            queries[qi], nbrs, points, 0, 16, k=k, cut=1.35, limit=10_000, metric="l2"
        )
        oracle_hits += len(set(e[0] for e in frontier[:k]) & set(gt[qi]))
        kernel_hits += len(set(np.asarray(res.frontier_ids[qi])[:k].tolist()) & set(gt[qi]))
    assert kernel_hits >= oracle_hits - 2, (kernel_hits, oracle_hits)
    assert kernel_hits / (nq * k) > 0.75


def test_inactive_and_exclude(rng):
    points, nbrs, ps, s2g = setup(rng)
    queries = rng.normal(size=(4, 16)).astype(np.float32)
    qp = jnp.asarray(pad_queries(queries, 16, ps.d_pad))
    active = jnp.array([True, False, True, False])
    res = batched_beam_search(
        ps.data, ps.norms_sq, jnp.asarray(nbrs), s2g, qp,
        jnp.zeros(4, jnp.int32), beam=8, k=0, cut=jnp.float32(10.0),
        limit=jnp.int32(1000), metric="l2", active_in=active,
    )
    # inactive queries return all-empty frontiers and zero stats
    assert (np.asarray(res.frontier_ids[1]) == 2**31 - 1).all()
    assert int(res.num_visited[1]) == 0
    # exclude: the excluded node never appears in results
    res2 = batched_beam_search(
        ps.data, ps.norms_sq, jnp.asarray(nbrs), s2g, qp,
        jnp.zeros(4, jnp.int32), beam=8, k=0, cut=jnp.float32(10.0),
        limit=jnp.int32(1000), metric="l2",
        exclude=jnp.full(4, 7, jnp.int32),
    )
    assert not (np.asarray(res2.frontier_ids) == 7).any()


def multi_expand_oracle(qv, nbrs, pts, start, beam, E, limit=10_000):
    """Batch-synchronous multi-expansion beam search: each step pops the E
    nearest unexplored frontier nodes, gathers all their neighbors, drops
    candidates not beating the pre-step cutoff, then merge+dedup+truncate.
    The kernel's expand>1 mode must match this exactly."""

    def dist(i):
        d = pts[i] - qv
        return float(np.dot(d, d))

    frontier = [(dist(start), start)]
    explored = set()
    nv = 0
    while nv < limit:
        unex = [e for e in frontier if e[1] not in explored]
        if not unex:
            break
        cur = unex[:E]
        explored.update(i for _, i in cur)
        nv += len(cur)
        cutoff = frontier[beam - 1][0] if len(frontier) >= beam else np.inf
        cand, cset = [], set()
        for _, c in cur:
            for nb in nbrs[c]:
                if nb < 0 or nb in cset:
                    continue
                cset.add(nb)
                dd = dist(nb)
                if dd < cutoff:
                    cand.append((dd, nb))
        merged = {}
        for d, i in frontier + cand:
            if i not in merged or d < merged[i]:
                merged[i] = d
        frontier = sorted((d, i) for i, d in merged.items())[:beam]
    return frontier, nv


@pytest.mark.parametrize("expand", [2, 4])
def test_multi_expand_matches_oracle(rng, expand):
    points, nbrs, ps, s2g = setup(rng, n=400)
    nq, beam = 24, 16
    queries = rng.normal(size=(nq, 16)).astype(np.float32)
    qp = jnp.asarray(pad_queries(queries, 16, ps.d_pad))
    res = batched_beam_search(
        ps.data, ps.norms_sq, jnp.asarray(nbrs), s2g, qp,
        jnp.zeros(nq, jnp.int32), beam=beam, k=0, cut=jnp.float32(10.0),
        limit=jnp.int32(10_000), metric="l2", expand=expand,
    )
    for qi in range(nq):
        want, nv = multi_expand_oracle(queries[qi], nbrs, points, 0, beam, expand)
        got = np.asarray(res.frontier_ids[qi])
        want_ids = np.array([i for _, i in want])
        assert (got[: len(want_ids)] == want_ids).all(), f"q{qi}"
        assert int(res.num_visited[qi]) == nv


def test_inline_neighbor_blocks_match_standard():
    """The inline neighbor-vector path (SlabGraph.attach_inline) must return
    the same frontier as the standard per-candidate gather path — exact fp32
    copies; the DISTANCE EXPRESSION differs in fp32 rounding (fused-norm
    256-wide dot vs separate-norm 128-wide dot), so near-ulp ties can
    reorder: compare dists to tolerance and ids as near-total overlap.
    Local rng: the session fixture's stream position must not pick the
    data (knife-edge ties made this order-dependent)."""
    import jax.numpy as jnp

    from rangefilteredann_tpu.models.vamana import SlabGraph
    from rangefilteredann_tpu.utils.data import make_pointset, pad_queries

    rng = np.random.default_rng(1234)
    n, d, r, q, beam = 500, 24, 8, 16, 12
    points = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(points, "l2")
    nbrs = random_graph(rng, n, r)
    g = SlabGraph(
        nbrs_dev=jnp.asarray(nbrs),
        slab_to_global_dev=jnp.arange(n, dtype=jnp.int32),
        nbrs_host=nbrs,
        degrees=(nbrs >= 0).sum(axis=1).astype(np.int32),
        bucket_slab_offsets=np.array([0, n]),
        slab_to_global_host=np.arange(n),
        identity_s2g=True,
    )
    g.attach_inline(ps)
    queries = jnp.asarray(pad_queries(
        rng.normal(size=(q, d)).astype(np.float32), d, ps.d_pad))
    starts = jnp.zeros((q,), jnp.int32)
    kw = dict(beam=beam, k=0, cut=jnp.float32(1.35),
              limit=jnp.int32(n), metric="l2", norm_col=ps.norm_col,
              identity_map=True)
    a = batched_beam_search(ps.data, ps.norms_sq, g.nbrs_dev,
                            g.slab_to_global_dev, queries, starts, **kw)
    b = batched_beam_search(ps.data, ps.norms_sq, g.nbrs_dev,
                            g.slab_to_global_dev, queries, starts,
                            nbr_vecs=g.nbr_vecs, nbr_norms=g.nbr_norms, **kw)
    ai = np.asarray(a.frontier_ids)
    bi = np.asarray(b.frontier_ids)
    overlap = np.mean([len(set(ai[i]) & set(bi[i])) / beam for i in range(q)])
    assert overlap >= 0.95, overlap
    np.testing.assert_allclose(np.sort(np.asarray(a.frontier_dists), axis=1),
                               np.sort(np.asarray(b.frontier_dists), axis=1),
                               rtol=1e-4, atol=1e-4)


def test_inline_bf16_blocks_high_recall(rng):
    """bf16 inline blocks keep frontier quality: >= 9 of top-10 ids match the
    exact path per query on well-separated data (storage rounding only)."""
    import jax.numpy as jnp

    from rangefilteredann_tpu.models.vamana import SlabGraph
    from rangefilteredann_tpu.utils.data import make_pointset, pad_queries

    n, d, r, q, beam = 800, 24, 8, 16, 16
    centers = rng.normal(size=(20, d)).astype(np.float32)
    points = (centers[rng.integers(0, 20, n)]
              + .2 * rng.normal(size=(n, d))).astype(np.float32)
    ps = make_pointset(points, "l2")
    nbrs = random_graph(rng, n, r)
    g = SlabGraph(jnp.asarray(nbrs), jnp.arange(n, dtype=jnp.int32), nbrs,
                  (nbrs >= 0).sum(1).astype(np.int32), np.array([0, n]),
                  np.arange(n), True)
    g.attach_inline(ps, jnp.bfloat16)
    assert g.nbr_vecs.dtype == jnp.bfloat16
    queries = jnp.asarray(pad_queries(
        rng.normal(size=(q, d)).astype(np.float32), d, ps.d_pad))
    starts = jnp.zeros((q,), jnp.int32)
    kw = dict(beam=beam, k=0, cut=jnp.float32(1.35), limit=jnp.int32(n),
              metric="l2", norm_col=ps.norm_col, identity_map=True)
    a = batched_beam_search(ps.data, ps.norms_sq, g.nbrs_dev,
                            g.slab_to_global_dev, queries, starts, **kw)
    b = batched_beam_search(ps.data, ps.norms_sq, g.nbrs_dev,
                            g.slab_to_global_dev, queries, starts,
                            nbr_vecs=g.nbr_vecs, nbr_norms=g.nbr_norms, **kw)
    ai = np.asarray(a.frontier_ids)[:, :10]
    bi = np.asarray(b.frontier_ids)[:, :10]
    overlap = np.mean([len(set(ai[i]) & set(bi[i])) for i in range(q)])
    assert overlap >= 9.0, overlap


def test_degree_limit_matches_truncated_graph(rng):
    """degree_limit semantics pinned on a REAL (distance-sorted) graph:
    expanding only the first L neighbors of each sorted adjacency row
    (ref: types.h:118, beamSearch.h neighbor loop) must equal a plain search
    over the graph truncated to its first L columns."""
    import jax.numpy as jnp

    from rangefilteredann_tpu import BuildParams
    from rangefilteredann_tpu.models.vamana import build_vamana_graph
    from rangefilteredann_tpu.utils.data import make_pointset, pad_queries

    n, d, nq, beam, dl = 1200, 16, 24, 16, 5
    points = rng.normal(size=(n, d)).astype(np.float32)
    ps = make_pointset(points, "l2")
    g = build_vamana_graph(ps, np.arange(n, dtype=np.int64),
                           np.array([0, n], dtype=np.int64),
                           BuildParams(R=12, L=24, alpha=1.2), seed=3)
    # the build distance-sorts adjacency rows (ref: index.h:131-134)
    queries = jnp.asarray(pad_queries(
        rng.normal(size=(nq, d)).astype(np.float32), d, ps.d_pad))
    starts = jnp.zeros(nq, jnp.int32)
    kw = dict(beam=beam, k=0, cut=jnp.float32(1.35), limit=jnp.int32(n),
              metric="l2", norm_col=ps.norm_col, identity_map=True)
    a = batched_beam_search(ps.data, ps.norms_sq, g.nbrs_dev,
                            g.slab_to_global_dev, queries, starts,
                            degree_limit=dl, **kw)
    trunc = jnp.asarray(g.nbrs_host[:, :dl])
    b = batched_beam_search(ps.data, ps.norms_sq, trunc,
                            g.slab_to_global_dev, queries, starts, **kw)
    np.testing.assert_array_equal(np.asarray(a.frontier_ids),
                                  np.asarray(b.frontier_ids))
    np.testing.assert_array_equal(np.asarray(a.num_visited),
                                  np.asarray(b.num_visited))


def test_inline_int8_quantized_with_rerank(rng):
    """int8-QUANTIZED inline blocks (float store, per-node scales, the 1M+
    HBM regime) + exact_rerank: the reranked top-10 must closely match the
    exact search's top-10, and the rerank distances must be exact fp32."""
    import jax.numpy as jnp

    from rangefilteredann_tpu.models.vamana import SlabGraph
    from rangefilteredann_tpu.ops.beam_search import exact_rerank
    from rangefilteredann_tpu.ops.topk import EMPTY_ID
    from rangefilteredann_tpu.utils.data import make_pointset, pad_queries

    n, d, r, q, beam = 800, 24, 8, 16, 24
    centers = rng.normal(size=(20, d)).astype(np.float32)
    points = (centers[rng.integers(0, 20, n)]
              + .2 * rng.normal(size=(n, d))).astype(np.float32)
    ps = make_pointset(points, "l2")
    nbrs = random_graph(rng, n, r)
    g = SlabGraph(jnp.asarray(nbrs), jnp.arange(n, dtype=jnp.int32), nbrs,
                  (nbrs >= 0).sum(1).astype(np.int32), np.array([0, n]),
                  np.arange(n), True)
    g.attach_inline(ps, jnp.int8)
    assert g.nbr_vecs.dtype == jnp.int8 and g.nbr_scale is not None
    # quantization quality: dequantized blocks within scale/2 per dim
    deq = (np.asarray(g.nbr_vecs).astype(np.float32)
           * np.asarray(g.nbr_scale)[:, None, None])
    gid = np.clip(nbrs, 0, n - 1)
    src = np.asarray(ps.data[:, :deq.shape[-1]]).copy()
    src[:, ps.norm_col] = 0.0  # attach_inline zeroes the fused-norm column
    want = src[gid]
    err = np.abs(deq - want).max()
    assert err <= np.asarray(g.nbr_scale).max() * 0.51, err

    queries = jnp.asarray(pad_queries(
        rng.normal(size=(q, d)).astype(np.float32), d, ps.d_pad))
    starts = jnp.zeros((q,), jnp.int32)
    kw = dict(beam=beam, k=0, cut=jnp.float32(1.35), limit=jnp.int32(n),
              metric="l2", norm_col=ps.norm_col, identity_map=True)
    a = batched_beam_search(ps.data, ps.norms_sq, g.nbrs_dev,
                            g.slab_to_global_dev, queries, starts, **kw)
    b = batched_beam_search(ps.data, ps.norms_sq, g.nbrs_dev,
                            g.slab_to_global_dev, queries, starts,
                            nbr_vecs=g.nbr_vecs, nbr_norms=g.nbr_norms,
                            nbr_scale=g.nbr_scale, **kw)
    # rerank the quantized frontier's top-18 exactly, keep 10
    rb_i, rb_d = exact_rerank(ps.data, ps.norms_sq, queries,
                              b.frontier_ids[:, :18], 10, "l2",
                              norm_col=ps.norm_col)
    ai = np.asarray(a.frontier_ids)[:, :10]
    bi = np.asarray(rb_i)
    overlap = np.mean([len(set(ai[i]) & set(bi[i])) for i in range(q)])
    assert overlap >= 9.0, overlap
    # rerank dists are exact: recompute in fp64 for the returned ids
    bi_np, bd_np = np.asarray(rb_i), np.asarray(rb_d)
    x64 = points.astype(np.float64)
    q64 = np.asarray(queries)[:, :d].astype(np.float64)
    for i in range(q):
        for j in range(10):
            if bi_np[i, j] == EMPTY_ID:
                continue
            true = (x64[bi_np[i, j]] ** 2).sum() - 2 * q64[i] @ x64[bi_np[i, j]]
            assert abs(true - bd_np[i, j]) < 1e-2, (true, bd_np[i, j])


def test_quant_inline_chunked_matches_single_chunk(rng):
    """_quant_inline_all's fori_loop chunking (incl. the overlapping LAST
    chunk when m is not a chunk multiple, and m < chunk) must produce
    bit-identical blocks/scales to one whole-slab chunk — this is the
    in-place path that replaced the 2x-HBM trim copy (round-3 OOM fix)."""
    import jax.numpy as jnp

    from rangefilteredann_tpu.models.vamana import _quant_inline_all

    n, d_pad, r = 700, 32, 6
    src = jnp.asarray(rng.normal(size=(n, d_pad)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, n, size=(n, r)).astype(np.int32))
    ref_buf, ref_sc = _quant_inline_all(src, gid, chunk=n)  # one chunk
    for chunk in (256, 512, 700):  # 700%256=188, 700%512=188, exact
        buf, sc = _quant_inline_all(src, gid, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(buf), np.asarray(ref_buf))
        np.testing.assert_array_equal(np.asarray(sc), np.asarray(ref_sc))


def test_merge_path_matches_sort_merge(rng):
    """The sort-free merge-path frontier merge must produce bit-identical
    (ids, dists, explored) to the lax.sort merge for every input shape the
    kernel feeds it: duplicate candidates (vs frontier and internal),
    EMPTY/inf padding, distance ties between distinct ids, and full or
    partially-empty frontiers."""
    from rangefilteredann_tpu.ops.beam_search import (
        EMPTY_ID, _merge_frontier_cands, _merge_frontier_cands_path)

    rng2 = np.random.default_rng(7)
    for trial in range(40):
        q = int(rng2.integers(1, 9))
        beam = int(rng2.choice([4, 8, 16, 40]))
        c = int(rng2.choice([3, 8, 48]))
        n_real = rng2.integers(0, beam + 1, size=q)
        f_ids = np.full((q, beam), EMPTY_ID, dtype=np.int32)
        f_d = np.full((q, beam), np.inf, dtype=np.float32)
        f_e = np.zeros((q, beam), dtype=np.int32)
        for i in range(q):
            r = int(n_real[i])
            ids = rng2.choice(1000, size=r, replace=False).astype(np.int32)
            # quantized dists force ties between distinct ids
            d = (rng2.integers(0, 6, size=r) * 0.25).astype(np.float32)
            order = np.lexsort((ids, d))
            f_ids[i, :r] = ids[order]
            f_d[i, :r] = d[order]
            f_e[i, :r] = rng2.integers(0, 2, size=r)
        c_ids = rng2.integers(0, 1000, size=(q, c)).astype(np.int32)
        c_d = (rng2.integers(0, 6, size=(q, c)) * 0.25).astype(np.float32)
        # inject EMPTY candidates and duplicates of frontier entries
        kill = rng2.random((q, c)) < 0.3
        c_ids = np.where(kill, EMPTY_ID, c_ids)
        c_d = np.where(kill, np.inf, c_d).astype(np.float32)
        for i in range(q):
            if n_real[i] and c >= 2:
                c_ids[i, 0] = f_ids[i, 0]  # dup of a frontier entry
        a = _merge_frontier_cands(
            jnp.asarray(f_ids), jnp.asarray(f_d), jnp.asarray(f_e),
            jnp.asarray(c_ids), jnp.asarray(c_d), beam)
        b = _merge_frontier_cands_path(
            jnp.asarray(f_ids), jnp.asarray(f_d), jnp.asarray(f_e),
            jnp.asarray(c_ids), jnp.asarray(c_d), beam)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]),
                                      err_msg=f"ids trial {trial}")
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]),
                                      err_msg=f"dists trial {trial}")
        # explored flags only matter on non-empty slots
        ne = np.asarray(a[0]) != EMPTY_ID
        np.testing.assert_array_equal(np.asarray(a[2])[ne], np.asarray(b[2])[ne],
                                      err_msg=f"expl trial {trial}")


def test_window_filter_topk_matches_sort_oracle(rng):
    """Sort-free window_filter_topk (rank selection over the already-sorted
    frontier) must match the filter+lexsort-by-(dist, global id) oracle —
    including distance ties and a non-identity (per-bucket ascending) slab
    map like the super-tree's."""
    from rangefilteredann_tpu.ops.beam_search import (
        EMPTY_ID, window_filter_topk)

    rng2 = np.random.default_rng(3)
    m = 500
    # ascending s2g (the documented contract: per-bucket contiguous ranges)
    s2g = jnp.asarray(np.sort(rng2.choice(5000, size=m, replace=False))
                      .astype(np.int32))
    s2g_h = np.asarray(s2g)
    for trial in range(20):
        q, b, k = 6, 32, 10
        f_ids = np.full((q, b), EMPTY_ID, dtype=np.int32)
        f_d = np.full((q, b), np.inf, dtype=np.float32)
        for i in range(q):
            r = int(rng2.integers(0, b + 1))
            ids = rng2.choice(m, size=r, replace=False).astype(np.int32)
            d = (rng2.integers(0, 5, size=r) * 0.5).astype(np.float32)  # ties
            order = np.lexsort((ids, d))
            f_ids[i, :r] = ids[order]
            f_d[i, :r] = d[order]
        lo = rng2.integers(0, 4000, size=q).astype(np.int32)
        hi = (lo + rng2.integers(0, 3000, size=q)).astype(np.int32)
        counts, g, d = window_filter_topk(
            jnp.asarray(f_ids), jnp.asarray(f_d), s2g,
            jnp.asarray(lo), jnp.asarray(hi), k)
        counts, g, d = np.asarray(counts), np.asarray(g), np.asarray(d)
        for i in range(q):
            real = f_ids[i] != EMPTY_ID
            gids = np.where(real, s2g_h[np.clip(f_ids[i], 0, m - 1)], -1)
            inwin = real & (gids >= lo[i]) & (gids < hi[i])
            assert counts[i] == inwin.sum()
            want_order = np.lexsort((gids[inwin], f_d[i][inwin]))
            want_g = gids[inwin][want_order][:k]
            want_d = f_d[i][inwin][want_order][:k]
            np.testing.assert_array_equal(g[i][: len(want_g)], want_g)
            np.testing.assert_array_equal(d[i][: len(want_d)], want_d)
            assert (g[i][len(want_g):] == EMPTY_ID).all()
            assert np.isinf(d[i][len(want_d):]).all()

"""Batched greedy best-first graph search (beam search) for TPU.

TPU-native re-design of the reference's beam_search hot loop
(ref: ParlayANN/algorithms/utils/beamSearch.h:53-184). The reference is a
per-query scalar loop over pointer-chased adjacency with a lossy hash filter
as an approximate visited set. Here the search is *batched over queries* in a
single `lax.while_loop` over fixed-shape state:

  * frontier: per query, a sorted (dist, id) array of size B with an
    "explored" flag per slot — replaces frontier + visited + unvisited_frontier.
  * visited-set: none. A node dropped from a full frontier can never re-enter
    (the frontier's k-th distance only improves), so exact dedup against the
    current frontier is enough to guarantee no node is expanded twice; a
    re-proposed dropped node just costs one recomputed distance, which on TPU
    is one lane of an already-fixed-shape matmul. This replaces the lossy hash
    filter with *exact* semantics at zero memory.
  * expansion: one node per step per query (the first unexplored frontier
    slot), its R neighbors gathered from the padded [m, R] adjacency, distances
    via one MXU block (ops/distances.gathered_distances).
  * merge: sort-based exact dedup + lexicographic (dist, id) sort, truncate to
    B, optional `cut` pruning (metric spaces only, ref: beamSearch.h:162-167).

Graphs are "slabs": adjacency rows hold slab-local int32 ids (-1 = padding),
and `slab_to_global [m]` maps slab positions to rows of the global point
store. Plain graphs use an identity/offset map; the overlapping-bucket super
tree uses the same kernel with a non-trivial map.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .distances import fused_norm_distances, gathered_distances
from .topk import EMPTY_ID

# Frontier-merge implementation for the narrow-candidate query path:
# "sort" (single two-key lax.sort) or "path" (merge-path ranks, sort-free).
# Read ONCE at import — setting RFANN_MERGE after `import rangefilteredann_tpu`
# has no effect (A/B harnesses must set it before the interpreter imports the
# package, as tools/exp_beam.py does via subprocess env). Parity is
# test-enforced (tests/test_beam_search.py).
MERGE_IMPL = os.environ.get("RFANN_MERGE", "sort")


def default_expand(beam: int) -> int:
    """Nodes to expand per QUERY step: 1, the reference's order
    (beamSearch.h:108). Measured on the v5e chip (tools/profile_tpu.py, real
    200k Vamana graph): single-expansion beats multi-expansion at every beam
    (beam 40: 148 ms vs 200/221/214 ms for expand 2/4/8 per 2048-query batch)
    — each step's gather+merge cost grows faster with expansion width than
    the while_loop trip count shrinks, and multi-expansion also visits nodes
    a converged search would never touch."""
    del beam
    return 1


def build_expand(L: int) -> int:
    """Nodes to expand per step for BUILD insertion searches. Kept at the
    multi-expansion schedule the cached graphs were built with (changing it
    reorders visited lists and would silently diverge from on-disk caches
    keyed only by build params)."""
    return max(1, min(8, L // 16))


@functools.partial(jax.jit, static_argnames=("k",))
def window_filter_topk(
    f_ids: jax.Array,  # [Q, B] slab ids, (dist, id)-sorted, EMPTY_ID padded
    f_d: jax.Array,  # [Q, B]
    s2g: jax.Array,  # [m] slab -> global sorted id (int32)
    win_lo: jax.Array,  # [Q] inclusive global window start
    win_hi: jax.Array,  # [Q] exclusive global window end
    k: int,
):
    """Label-window filter + top-k of a beam frontier, on device
    (ref: postfilter_vamana.h:223-254 filtering loop). Returns
    (counts [Q], gids [Q, k] int32 EMPTY_ID-padded, dists [Q, k]).

    Sort-free: the frontier arrives (dist, slab-id)-sorted and window
    filtering preserves relative order, so the top-k in-window entries are
    the first k by in-window rank — k argmax+gather rounds replace the
    [Q, B] two-key sort (which dominates at doubling beams of 512-2048).
    Tie order matches the previous sort-by-(dist, GLOBAL id) because every
    search's frontier lives in one bucket's slab range, where slab -> global
    is ascending (flat graphs and tree rows: identity; super-tree rows:
    per-bucket contiguous ranges) — pinned by the oracle/GT parity tests."""
    m = s2g.shape[0]
    valid = f_ids != EMPTY_ID
    gids = s2g[jnp.clip(f_ids, 0, m - 1)]
    inwin = valid & (gids >= win_lo[:, None]) & (gids < win_hi[:, None])
    counts = inwin.sum(axis=1, dtype=jnp.int32)
    rank = jnp.cumsum(inwin.astype(jnp.int32), axis=1)  # 1-based in-window
    out_d, out_g = [], []
    for j in range(k):
        hit = inwin & (rank == j + 1)  # at most one True per row
        has = hit.any(axis=1)
        p = jnp.argmax(hit, axis=1)[:, None]
        out_d.append(jnp.where(
            has, jnp.take_along_axis(f_d, p, 1)[:, 0], jnp.inf))
        out_g.append(jnp.where(
            has, jnp.take_along_axis(gids, p, 1)[:, 0], EMPTY_ID))
    return counts, jnp.stack(out_g, axis=1), jnp.stack(out_d, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "metric", "norm_col"))
def exact_rerank(
    data: jax.Array,  # [n, d_pad] global point store (float)
    norms_sq: jax.Array,  # [n]
    queries: jax.Array,  # [Q, d_pad] f32
    gids: jax.Array,  # [Q, C] global sorted ids, EMPTY_ID padded
    k: int,
    metric: str,
    norm_col: Optional[int] = None,
):
    """Recompute exact fp32 distances for candidate global ids and return the
    (dist, id)-sorted top-k: (counts-unchanged helper for quantized-inline
    searches, whose frontier scores carry int8 rounding). One [Q, C] row
    gather — C is k + a small slack, so this is noise next to the search."""
    n = data.shape[0]
    valid = gids != EMPTY_ID
    safe = jnp.clip(gids, 0, n - 1)
    vecs = data[safe]
    if norm_col is not None:
        d = fused_norm_distances(vecs, queries, metric, norm_col)
    else:
        d = gathered_distances(queries, vecs, norms_sq[safe], metric)
    d = jnp.where(valid, d, jnp.inf)
    g = jnp.where(valid, gids, EMPTY_ID)
    d, g = jax.lax.sort((d, g), num_keys=2)
    return g[:, :k], d[:, :k]


class BeamResult(NamedTuple):
    frontier_ids: jax.Array  # [Q, B] slab ids, EMPTY_ID = empty slot
    frontier_dists: jax.Array  # [Q, B] f32, +inf = empty
    num_visited: jax.Array  # [Q] int32 nodes expanded
    dist_cmps: jax.Array  # [Q] int32 distance computations
    visited_ids: jax.Array  # [Q, V] slab ids in visit order (or [Q, 0])
    visited_dists: jax.Array  # [Q, V]


def _merge_dedup_sort(ids, dists, expl, beam):
    """Exact dedup-by-id then (dist, id) sort; returns the best `beam` slots.

    Used by the generic merge path (frontier may contain duplicates). Packs
    (id, flag) into one int32 sort key (requires slab size < 2^30) to halve
    sort operand traffic; keep-first priority goes to explored copies.
    """
    # ids*2 would overflow for EMPTY_ID (int32 max); empties keep their own key
    key1 = jnp.where(ids == EMPTY_ID, EMPTY_ID, ids * 2 + (1 - expl))
    s_key1, s_d = jax.lax.sort((key1, dists), num_keys=1)
    is_empty = s_key1 == EMPTY_ID
    s_ids = jnp.where(is_empty, EMPTY_ID, s_key1 >> 1)
    s_e = jnp.where(is_empty, 0, 1 - (s_key1 & 1))
    dup = jnp.concatenate(
        [jnp.zeros_like(s_ids[:, :1], dtype=bool), s_ids[:, 1:] == s_ids[:, :-1]],
        axis=1,
    ) & ~is_empty
    key2 = jnp.where(dup | is_empty, EMPTY_ID, s_ids * 2 + s_e)
    s_d = jnp.where(dup, jnp.inf, s_d)
    f_d, f_key2 = jax.lax.sort((s_d, key2), num_keys=2)
    f_ids = jnp.where(f_key2 == EMPTY_ID, EMPTY_ID, f_key2 >> 1)
    f_e = jnp.where(f_key2 == EMPTY_ID, 0, f_key2 & 1)
    return f_ids[:, :beam], f_d[:, :beam], f_e[:, :beam]


def _dedup_cands(f_ids, c_ids, c_d):
    """Mask candidate duplicates — against the frontier (the frontier copy
    wins, matching explored-copy priority: candidates are always unexplored)
    and against earlier candidate slots (keep-first) — with O(C*(B+C)) VPU
    compares instead of a dedup sort."""
    dup_f = (c_ids[:, :, None] == f_ids[:, None, :]).any(axis=2)  # [Q, C]
    same = c_ids[:, :, None] == c_ids[:, None, :]  # [Q, C, C]
    c = c_ids.shape[1]
    earlier = jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2) < \
        jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
    dup_c = (same & earlier).any(axis=2)
    dup = (dup_f | dup_c) & (c_ids != EMPTY_ID)
    return (jnp.where(dup, EMPTY_ID, c_ids), jnp.where(dup, jnp.inf, c_d))


def _merge_frontier_cands(f_ids, f_d, f_e, c_ids, c_d, beam):
    """Merge a duplicate-free sorted frontier with fresh candidates; only ONE
    (dist, key) sort runs per step instead of a dedup sort plus a rank sort.
    Exactness is enforced by the beam-search oracle tests."""
    c_ids, c_d = _dedup_cands(f_ids, c_ids, c_d)
    m_ids = jnp.concatenate([f_ids, c_ids], axis=1)
    m_d = jnp.concatenate([f_d, c_d], axis=1)
    m_e = jnp.concatenate([f_e, jnp.zeros_like(c_ids)], axis=1)
    key = jnp.where(m_ids == EMPTY_ID, EMPTY_ID, m_ids * 2 + m_e)
    s_d, s_key = jax.lax.sort((m_d, key), num_keys=2)
    o_ids = jnp.where(s_key == EMPTY_ID, EMPTY_ID, s_key >> 1)
    o_e = jnp.where(s_key == EMPTY_ID, 0, s_key & 1)
    return o_ids[:, :beam], s_d[:, :beam], o_e[:, :beam]


def _merge_frontier_cands_path(f_ids, f_d, f_e, c_ids, c_d, beam):
    """Sort-free merge of the sorted frontier with fresh candidates via
    merge-path ranks: only the C-wide candidate set is sorted; each merged
    output slot then computes its source with rank compares + two row
    gathers. Replaces the per-step [Q, B+C] two-key lax.sort (the serial
    bitonic network dominates the step at large beams) with O(B*C) VPU
    compares. Exact same (dist, id) order — both (id, flag) tie rules and
    EMPTY padding match `_merge_frontier_cands` (oracle + parity tested)."""
    q, b = f_ids.shape
    c = c_ids.shape[1]
    c_ids, c_d = _dedup_cands(f_ids, c_ids, c_d)
    # sort candidates by (dist, id); candidates are always unexplored (e=0)
    c_d, c_ids = jax.lax.sort((c_d, c_ids), num_keys=2)
    # merge-path ranks. Strict-vs-nonstrict asymmetry makes positions unique:
    #   pos_f[i] = i + #{j : (c_j  <  f_i)}   (candidate strictly less)
    #   pos_c[j] = j + #{i : (f_i  <= c_j)}   (frontier wins ties — including
    #                                          the all-EMPTY/inf padding tail)
    fd_b = f_d[:, :, None]  # [Q, B, 1]
    fi_b = f_ids[:, :, None]
    cd_b = c_d[:, None, :]  # [Q, 1, C]
    ci_b = c_ids[:, None, :]
    leq_fc = (fd_b < cd_b) | ((fd_b == cd_b) & (fi_b <= ci_b))  # [Q, B, C]
    pos_c = jax.lax.broadcasted_iota(jnp.int32, (q, c), 1) + \
        leq_fc.sum(axis=1, dtype=jnp.int32)  # [Q, C]
    # output slot p < beam: from a candidate iff some pos_c == p
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (q, beam), 1)
    is_c = pos_c[:, None, :] == iota_p[:, :, None]  # [Q, P, C]
    from_c = is_c.any(axis=2)
    c_sel = jnp.argmax(is_c, axis=2)  # [Q, P]
    # frontier source index: slot p minus the candidates placed before it
    f_sel = iota_p - (jnp.cumsum(from_c.astype(jnp.int32), axis=1) -
                      from_c.astype(jnp.int32))
    f_sel = jnp.minimum(f_sel, b - 1)  # always < b; clamp for safety
    take = jnp.take_along_axis
    o_d = jnp.where(from_c, take(c_d, c_sel, 1), take(f_d, f_sel, 1))
    o_i = jnp.where(from_c, take(c_ids, c_sel, 1), take(f_ids, f_sel, 1))
    o_e = jnp.where(from_c, 0, take(f_e, f_sel, 1))
    return o_i, o_d, o_e


# Fused Pallas beam kernel routing (ops/pallas_beam.py). The kernel is
# exact-parity for the query configuration it supports; beams past the cap
# fall back to the XLA path (insertion cost grows with the lane width).
# Default OFF until the on-chip A/B (tools/exp_pallas_beam.py) proves a win:
# the round-4 kernel never lowered on real TPUs before the qcat block-spec
# fix (pallas_beam.py), so its chip speed is unmeasured. Set
# RFANN_PALLAS_BEAM=1 to route eligible searches through it.
PALLAS_BEAM = os.environ.get("RFANN_PALLAS_BEAM", "0") != "0"
PALLAS_MAX_BEAM = int(os.environ.get("RFANN_PALLAS_MAX_BEAM", "512"))


def pallas_beam_eligible(graph, beam, expand, degree_limit, metric,
                         exclude=None, k=0, mesh=None) -> bool:
    """True when the fused Pallas kernel covers this search exactly:
    query-mode (k=0 — no cut pruning), single expansion, full adjacency
    rows, fp32 inline blocks with R <= 64, no exclusion, single device."""
    if not PALLAS_BEAM or mesh is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    if graph.nbr_vecs is None or graph.nbrs_dev.shape[1] > 64:
        return False
    dt = graph.nbr_vecs.dtype
    if dt == jnp.int8:
        if graph.nbr_scale is None:
            return False  # native-int8 exact inline stays on the XLA path
    elif dt not in (jnp.float32, jnp.bfloat16):
        return False
    if graph.nbr_vecs.shape[2] > 128:
        return False  # V/prod/S scratches would exceed the 16 MB VMEM scope
    return (expand == 1 and degree_limit == 0 and k == 0
            and exclude is None and beam <= PALLAS_MAX_BEAM
            and metric in ("l2", "mips"))


_PALLAS_BROKEN = False
# Layout override private to the SAFE wrapper: set to "2d" after the 3d
# layout fails once, so unattended sweeps degrade without mutating
# pallas_beam.LAYOUT (which A/B harnesses read/set — a hidden process-wide
# flip there made later explicit-layout comparisons misreport; round-4
# verdict weak #3).
_SAFE_LAYOUT = None


def pallas_beam_search_safe(ps, graph, queries, starts, *, beam, limit,
                            metric, active_in):
    """pallas_beam_search, or None on ANY failure (Mosaic compile error at
    an unexercised shape, HBM exhaustion building the meta rows, ...) —
    after which the kernel is disabled for the rest of the process so
    unattended sweeps degrade to the XLA path instead of dying."""
    global _PALLAS_BROKEN, _SAFE_LAYOUT
    if _PALLAS_BROKEN:
        return None
    try:
        return pallas_beam_search(
            ps, graph, queries, starts, beam=beam, limit=limit,
            metric=metric, active_in=active_in, layout=_SAFE_LAYOUT)
    except Exception as e:  # noqa: BLE001 — deliberate blanket fallback
        import warnings

        from . import pallas_beam as _pb

        if (_SAFE_LAYOUT or _pb.LAYOUT) == "3d":
            # the batched-dot_general layout is the one Mosaic might reject
            # at an unexercised shape — drop this wrapper to the proven
            # segment-matmul layout before giving up on the kernel entirely
            _SAFE_LAYOUT = "2d"
            warnings.warn(
                f"Pallas beam 3d layout failed ({type(e).__name__}: {e}); "
                "retrying with the 2d segment-matmul layout", stacklevel=2)
            return pallas_beam_search_safe(
                ps, graph, queries, starts, beam=beam, limit=limit,
                metric=metric, active_in=active_in)
        _PALLAS_BROKEN = True
        warnings.warn(
            f"fused Pallas beam kernel failed ({type(e).__name__}: {e}); "
            "falling back to the XLA path for this process", stacklevel=2)
        return None


def pallas_beam_search(
    ps, graph, queries, starts, *, beam, limit, metric, active_in,
    layout=None,
) -> BeamResult:
    """Run the fused Pallas kernel with the XLA-path init semantics
    (start distance computed exactly as batched_beam_search's init —
    see `d0` below) and return a BeamResult (visited arrays empty).
    `layout=None` uses pallas_beam.LAYOUT (the env default)."""
    from . import pallas_beam as _pb
    from .pallas_beam import (build_meta, pack_meta_into_blocks,
                              pallas_beam_search_inline)

    eff_layout = layout or _pb.LAYOUT
    if getattr(graph, "nbr_meta", None) is None:
        graph.nbr_meta = build_meta(
            graph.nbrs_dev, graph.nbr_norms, graph.nbr_scale)
    # one-DMA packed blocks (pallas_beam.PACKED comment): f32 + 3d only,
    # and only where the extra (R+1)/R copy of the inline slab fits HBM
    use_packed = (_pb.PACKED and eff_layout == "3d"
                  and graph.nbr_vecs.dtype == jnp.float32
                  and graph.nbr_meta.shape[1] == graph.nbr_vecs.shape[2]
                  and graph.nbr_vecs.nbytes <= 6e9)
    if use_packed and getattr(graph, "nbr_packed", None) is None:
        graph.nbr_packed = pack_meta_into_blocks(
            graph.nbr_vecs, graph.nbr_meta)
    w = graph.nbr_vecs.shape[2]
    m = graph.nbrs_dev.shape[0]
    start_safe = jnp.clip(starts, 0, m - 1)
    start_gid = (start_safe if graph.identity_s2g
                 else graph.slab_to_global_dev[start_safe])
    norm_col = ps.norm_col if ps.norm_col >= 0 else None
    if norm_col is not None:
        d0 = fused_norm_distances(
            ps.data[start_gid][:, None, :], queries, metric, norm_col)[:, 0]
    else:
        d0 = gathered_distances(
            queries, ps.data[start_gid][:, None, :],
            ps.norms_sq[start_gid][:, None], metric)[:, 0]
    f_ids, f_d, n_vis, cmps = pallas_beam_search_inline(
        graph.nbr_packed if use_packed else graph.nbr_vecs,
        graph.nbr_meta, queries[:, :w],
        starts, d0, active_in,
        beam=int(beam), limit=int(limit), metric=metric, packed=use_packed,
        layout=eff_layout)
    return BeamResult(f_ids, f_d, n_vis, cmps,
                      f_ids[:, :0], f_d[:, :0])


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam", "k", "metric", "return_visited", "visited_cap", "expand",
        "degree_limit", "norm_col", "identity_map",
    ),
)
def batched_beam_search(
    data: jax.Array,  # [n, d_pad] global point store
    norms_sq: jax.Array,  # [n]
    nbrs: jax.Array,  # [m, R] int32 slab-local adjacency, -1 padded
    slab_to_global: jax.Array,  # [m] int32 slab -> global point row
    queries: jax.Array,  # [Q, d_pad] f32
    starts: jax.Array,  # [Q] int32 slab start ids
    *,
    beam: int,
    k: int,  # 0 = build-mode (no cut pruning)
    cut: jax.Array,  # scalar f32
    limit: jax.Array,  # scalar int32 max nodes visited
    metric: str,
    active_in: Optional[jax.Array] = None,  # [Q] bool, False = padded query
    exclude: Optional[jax.Array] = None,  # [Q] slab id to never propose (-1 none)
    q_norms_sq: Optional[jax.Array] = None,  # [Q] ||q||^2, needed for L2 cut pruning
    return_visited: bool = False,
    visited_cap: int = 0,
    expand: int = 1,  # nodes expanded per step (1 = reference-exact order)
    degree_limit: int = 0,  # expand only the first `degree_limit` neighbors
    # of each node (adjacency rows are distance-sorted by the build,
    # ref: vamana/index.h:131-134; QueryParams.degree_limit, types.h:118).
    # 0 = no limit.
    norm_col: Optional[int] = None,  # column of `data` holding ||x||^2
    # (PointSet.norm_col). With it, the query's entry at that column is set
    # to -0.5 (L2) / 0 (MIPS) so the shifted distance is just -2*ip — the
    # norm is consumed INSIDE the matmul and the per-candidate norms_sq
    # element-gather (row-rate-bound on TPU) disappears.
    identity_map: bool = False,  # slab_to_global is the identity: skip its
    # per-candidate gather (true for every non-overlapping graph).
    nbr_vecs: Optional[jax.Array] = None,  # [m, R, w] inline copies of each
    # node's neighbor VECTORS (exact fp32, norm column zeroed), so expanding
    # a node gathers ONE contiguous [R, w] block instead of R scattered point
    # rows — XLA row gathers are row-rate-bound, so this divides the
    # expansion gather count by R. Memory: m*R*w*4 bytes; attach only where
    # HBM allows (SlabGraph.attach_inline).
    nbr_norms: Optional[jax.Array] = None,  # [m, R] matching ||x||^2 values
    nbr_scale: Optional[jax.Array] = None,  # [m] per-node dequant scales:
    # when set, nbr_vecs holds int8-QUANTIZED copies of a float store
    # (x ~= scale[node] * x_hat) and candidate distances are computed as
    # norms - 2*scale*(q . x_hat) — approximate by the int8 rounding; callers
    # restore exactness with an exact_rerank of the final candidates. This is
    # what fits 1M-point inline blocks in HBM (6.1 GB vs fp32's 24.5).
) -> BeamResult:
    q, _ = queries.shape
    m, r = nbrs.shape
    assert m < 2**30, "slab ids must fit packed int32 sort keys (m < 2^30)"
    if degree_limit and degree_limit < r:
        r = degree_limit
    v_cap = visited_cap if return_visited else 0

    if active_in is None:
        active_in = jnp.ones((q,), dtype=bool)
    if exclude is None:
        exclude = jnp.full((q,), -1, dtype=jnp.int32)
    if q_norms_sq is None:
        q_norms_sq = jnp.zeros((q,), dtype=jnp.float32)

    def _dists(gathered_vecs, gathered_gids):
        """Per-query candidate distances, fused-norm or separate-norm form."""
        if norm_col is not None:
            return fused_norm_distances(
                gathered_vecs, queries, metric, norm_col
            )
        return gathered_distances(
            queries, gathered_vecs, norms_sq[gathered_gids], metric
        )

    # --- init: frontier = {start} ---
    start_safe = jnp.clip(starts, 0, m - 1)
    start_gid = start_safe if identity_map else slab_to_global[start_safe]
    d0 = _dists(data[start_gid][:, None, :], start_gid[:, None])[:, 0]
    f_ids = jnp.full((q, beam), EMPTY_ID, dtype=jnp.int32)
    f_ids = f_ids.at[:, 0].set(jnp.where(active_in, starts.astype(jnp.int32), EMPTY_ID))
    f_d = jnp.full((q, beam), jnp.inf, dtype=jnp.float32)
    f_d = f_d.at[:, 0].set(jnp.where(active_in, d0, jnp.inf))
    f_e = jnp.zeros((q, beam), dtype=jnp.int32)

    n_vis = jnp.zeros((q,), dtype=jnp.int32)
    cmps = jnp.where(active_in, 1, 0).astype(jnp.int32)
    vis_ids = jnp.full((q, max(v_cap, 1)), EMPTY_ID, dtype=jnp.int32)
    vis_d = jnp.full((q, max(v_cap, 1)), jnp.inf, dtype=jnp.float32)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (q, r), 1)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (q, beam), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (q, max(v_cap, 1)), 1)

    def cond(state):
        f_ids, f_d, f_e, n_vis, cmps, vis_ids, vis_d = state
        unexplored = (f_e == 0) & (f_ids != EMPTY_ID)
        return jnp.any(unexplored.any(axis=1) & (n_vis < limit))

    def body(state):
        f_ids, f_d, f_e, n_vis, cmps, vis_ids, vis_d = state
        unexplored = (f_e == 0) & (f_ids != EMPTY_ID)
        active = unexplored.any(axis=1) & (n_vis < limit)

        # pick the `expand` nearest unexplored frontier nodes (frontier is
        # dist-sorted, so these are the first `expand` unexplored slots).
        # expand == 1 reproduces the reference's one-node-per-step order
        # (beamSearch.h:108); expand > 1 is the TPU-friendly multi-expansion
        # that divides the sequential while_loop length by ~expand.
        if expand == 1:
            sel = jnp.argmax(unexplored, axis=1)[:, None]  # [Q, 1]
        else:
            # first `expand` unexplored slots via a cumsum rank match — a
            # [Q, E, B] compare is far cheaper on the VPU than top_k's sort
            rank = jnp.cumsum(unexplored.astype(jnp.int32), axis=1)  # [Q, B]
            e_rank = jax.lax.broadcasted_iota(jnp.int32, (1, expand, 1), 1) + 1
            hit = unexplored[:, None, :] & (rank[:, None, :] == e_rank)
            sel = jnp.argmax(hit, axis=2)  # [Q, E] (0 if no e-th slot; masked
            #                                by sel_act below via n_unex)
        n_unex = unexplored.sum(axis=1, dtype=jnp.int32)  # [Q]
        e_iota = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
        sel_act = active[:, None] & (e_iota < n_unex[:, None])  # [Q, E]
        sel_onehot = (iota_b[:, None, :] == sel[:, :, None]) & sel_act[:, :, None]
        cur = jnp.take_along_axis(f_ids, sel, axis=1)  # [Q, E]
        cur_d = jnp.take_along_axis(f_d, sel, axis=1)
        cur_safe = jnp.clip(cur, 0, m - 1)

        # mark explored; record in visit order
        f_e = jnp.where(sel_onehot.any(axis=1), 1, f_e)
        if v_cap:
            slot = n_vis[:, None] + jnp.cumsum(sel_act.astype(jnp.int32), 1) - 1
            at = (iota_v[:, None, :] == slot[:, :, None]) & sel_act[:, :, None]
            vis_ids = jnp.where(
                at.any(1), jnp.where(at, cur[:, :, None], 0).sum(1), vis_ids
            )
            vis_d = jnp.where(
                at.any(1), jnp.where(at, cur_d[:, :, None], 0.0).sum(1), vis_d
            )
        n_vis = n_vis + sel_act.sum(axis=1, dtype=jnp.int32)

        # gather neighbor ids + distances
        cand = nbrs[cur_safe][..., :r].reshape(q, -1)  # [Q, E*r] slab ids
        valid = (
            (cand >= 0)
            & jnp.repeat(sel_act, r, axis=1)
            & (cand != exclude[:, None])
        )
        cand_safe = jnp.clip(cand, 0, m - 1)
        if nbr_vecs is not None:
            # inline path: one contiguous [R, w] block per expanded node
            blk = nbr_vecs[cur_safe][..., :r, :]  # [Q, E, r, w]
            w = blk.shape[-1]
            vecs = blk.reshape(q, -1, w)
            nrm = nbr_norms[cur_safe][..., :r].reshape(q, -1)
            if nbr_scale is not None:
                # int8-QUANTIZED inline over a float store: x ~= s * x_hat,
                # d = ||x||^2 - 2*s*(q . x_hat); the bf16 dot is exact on
                # the int8 values, so the only error is the quantization
                s = jnp.repeat(nbr_scale[cur_safe], r, axis=1)  # [Q, E*r]
                ip = -gathered_distances(
                    queries[:, :w], vecs, jnp.zeros_like(nrm), "mips")
                cand_dist = (nrm - 2.0 * s * ip if metric == "l2"
                             else -s * ip)
            else:
                # bf16 inline stores upcast AFTER the gather: the matmul
                # stays fp32 (only x's storage rounding remains; norms are
                # fp32); native int8/uint8 inline blocks stay integer —
                # gathered_distances runs them as exact bf16 MXU passes
                if vecs.dtype == jnp.bfloat16:
                    vecs = vecs.astype(jnp.float32)
                cand_dist = gathered_distances(
                    queries[:, :w], vecs, nrm, metric)
        else:
            if identity_map:
                gid_safe = cand_safe
            else:
                gid = slab_to_global[cand_safe]
                gid_safe = jnp.clip(gid, 0, data.shape[0] - 1)
            cand_dist = _dists(data[gid_safe], gid_safe)
        cmps = cmps + valid.sum(axis=1, dtype=jnp.int32)

        # drop candidates not beating the current worst of a full frontier
        # (ref: beamSearch.h:133-144)
        full = f_ids[:, beam - 1] != EMPTY_ID
        cutoff = jnp.where(full, f_d[:, beam - 1], jnp.inf)
        keep = valid & (cand_dist < cutoff[:, None])
        cand_ids = jnp.where(keep, cand, EMPTY_ID).astype(jnp.int32)
        cand_dist = jnp.where(keep, cand_dist, jnp.inf)

        # merge, dedup, truncate to beam. The frontier is duplicate-free by
        # induction, so for narrow candidate sets (query mode: C = R at
        # expand=1) compare-masking replaces the dedup sort; for the wide
        # multi-expansion candidate sets of builds the O(C^2) compare would
        # cost more than the sort it saves.
        if cand_ids.shape[1] <= 128:
            merge = (_merge_frontier_cands_path if MERGE_IMPL == "path"
                     else _merge_frontier_cands)
            nf_ids, nf_d, nf_e = merge(
                f_ids, f_d, f_e, cand_ids, cand_dist, beam)
        else:
            m_ids = jnp.concatenate([f_ids, cand_ids], axis=1)
            m_d = jnp.concatenate([f_d, cand_dist], axis=1)
            m_e = jnp.concatenate([f_e, jnp.zeros_like(cand_ids)], axis=1)
            nf_ids, nf_d, nf_e = _merge_dedup_sort(m_ids, m_d, m_e, beam)

        # cut pruning (query mode, metric spaces only; ref: beamSearch.h:162-167).
        # Internal L2 dists are shifted by -||q||^2; `d_true < cut * dk_true`
        # rewritten in shifted form is `d < cut*dk + (cut-1)*||q||^2`.
        if k > 0 and k < beam and metric == "l2":
            kth = nf_d[:, k]
            do_prune = jnp.isfinite(kth)  # more than k entries present
            keep_cut = nf_d < (cut * kth + (cut - 1.0) * q_norms_sq)[:, None]
            drop = do_prune[:, None] & ~keep_cut
            nf_ids = jnp.where(drop, EMPTY_ID, nf_ids)
            nf_d = jnp.where(drop, jnp.inf, nf_d)
            nf_e = jnp.where(drop, 0, nf_e)

        # inactive queries keep their old frontier untouched
        nf_ids = jnp.where(active[:, None], nf_ids, f_ids)
        nf_d = jnp.where(active[:, None], nf_d, f_d)
        nf_e = jnp.where(active[:, None], nf_e, f_e)
        return nf_ids, nf_d, nf_e, n_vis, cmps, vis_ids, vis_d

    state = (f_ids, f_d, f_e, n_vis, cmps, vis_ids, vis_d)
    f_ids, f_d, f_e, n_vis, cmps, vis_ids, vis_d = jax.lax.while_loop(
        cond, body, state
    )
    if not return_visited:
        vis_ids = vis_ids[:, :0]
        vis_d = vis_d[:, :0]
    return BeamResult(f_ids, f_d, n_vis, cmps, vis_ids, vis_d)

"""Multi-chip execution via jax.sharding + shard_map.

The reference is single-node shared-memory (SURVEY.md §2d): its only
parallelism is fork-join work stealing over queries and buckets. The TPU
scale-out story replaces that with SPMD over a device Mesh:

  * **Query sharding** (the common case): queries are embarrassingly
    parallel — shard the query batch across devices, replicate the point
    store + adjacency. No collectives until results are gathered.
  * **Index sharding** (for stores larger than one HBM): shard the
    label-sorted point store across devices on the row axis; brute-force
    scans compute per-device partial top-k and merge with an all_gather over
    ICI. (Graph rows can be sharded the same way by bucket; round 1 ships the
    brute-force variant, which is the memory-bound path that needs it first.)

Tested on a virtual CPU mesh (tests/conftest.py forces 8 host devices);
`__graft_entry__.dryrun_multichip` drives both shardings end to end.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.beam_search import batched_beam_search
from ..ops.distances import query_block_distances
from ..ops.topk import EMPTY_ID, masked_topk


def replicate_index(ps, graphs, mesh: Mesh) -> None:
    """Device_put an index's point store + slab graphs replicated over `mesh`
    (in place). Shared by every index class's .shard()."""
    repl = NamedSharding(mesh, P())
    ps.data = jax.device_put(ps.data, repl)
    ps.norms_sq = jax.device_put(ps.norms_sq, repl)
    for g in graphs:
        if g is not None:
            g.ensure_device()  # lazily-resident rows re-upload first
            g.nbrs_dev = jax.device_put(g.nbrs_dev, repl)
            g.slab_to_global_dev = jax.device_put(g.slab_to_global_dev, repl)


def make_mesh(n_devices: Optional[int] = None, axis: str = "q") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_beam_search(
    mesh: Mesh,
    data, norms_sq, nbrs, slab_to_global,
    queries, starts,
    *, beam: int, k: int, cut, limit, metric: str,
    q_norms_sq=None,
):
    """Query-sharded batched beam search: queries split on the mesh axis,
    index replicated. The kernel is per-query SPMD, so XLA partitions the
    while_loop with zero collectives."""
    axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    shard_q = NamedSharding(mesh, P(axis))
    data = jax.device_put(data, repl)
    norms_sq = jax.device_put(norms_sq, repl)
    nbrs = jax.device_put(nbrs, repl)
    slab_to_global = jax.device_put(slab_to_global, repl)
    queries = jax.device_put(queries, shard_q)
    starts = jax.device_put(starts, shard_q)
    if q_norms_sq is not None:
        q_norms_sq = jax.device_put(q_norms_sq, shard_q)
    return batched_beam_search(
        data, norms_sq, nbrs, slab_to_global, queries, starts,
        beam=beam, k=k, cut=cut, limit=limit, metric=metric,
        q_norms_sq=q_norms_sq,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "mesh", "axis")
)
def _sharded_scan_impl(data_sh, norms_sh, queries, starts, ends, row_offset, k, metric, mesh, axis):
    try:  # jax >= 0.8 moved shard_map out of experimental
        from jax import shard_map

        check_kwargs = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map

        check_kwargs = {"check_rep": False}

    def local_scan(data_local, norms_local, queries, starts, ends, row_offset):
        # each device scans its own row-shard of the point store
        idx = jax.lax.axis_index(axis)
        n_local = data_local.shape[0]
        base = row_offset + idx * n_local
        dists = query_block_distances(queries, data_local, norms_local, metric)
        col = base + jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
        valid = (col >= starts[:, None]) & (col < ends[:, None])
        dists = jnp.where(valid, dists, jnp.inf)
        ids = jnp.where(valid, col, EMPTY_ID)
        d_loc, i_loc = masked_topk(dists, ids, k)
        # merge partial top-k across devices over ICI
        d_all = jax.lax.all_gather(d_loc, axis, axis=1).reshape(dists.shape[0], -1)
        i_all = jax.lax.all_gather(i_loc, axis, axis=1).reshape(dists.shape[0], -1)
        return masked_topk(d_all, i_all, k)

    return shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(), P()),
        **check_kwargs,  # replication checking off (all_gather merge)
    )(data_sh, norms_sh, queries, starts, ends, row_offset)


class ShardedGraphRow:
    """One B-WST/slab row bucket-sharded across a device Mesh (SURVEY §5h:
    for indices larger than one HBM, shard tree buckets across devices and
    route each query to the owning device).

    Bucket graphs are self-contained (a bucket's adjacency only references
    ids inside the bucket), so a shard = a set of whole buckets with its own
    point rows, norms, and shard-local adjacency — searches need ZERO
    cross-device traffic; the only collective is the implicit result gather
    when the host reads the sharded output. Built by `shard_graph_row`."""

    def __init__(self, mesh, points_sh, norms_sh, nbrs_sh, local_to_global,
                 bucket_device, bucket_local_start, ms, beam_unused=None):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.points_sh = points_sh  # [D*ms, d_pad] sharded on axis
        self.norms_sh = norms_sh  # [D*ms]
        self.nbrs_sh = nbrs_sh  # [D*ms, R] shard-local ids
        self.local_to_global = local_to_global  # [D, ms] host: -> global ids
        self.bucket_device = bucket_device  # [nb] host
        self.bucket_local_start = bucket_local_start  # [nb] host
        self.ms = ms  # slab rows per device (padded equal)

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))


def shard_plan_rows_per_device(graph, n_devices: int) -> int:
    """Post-packing rows-per-device (ms) that shard_graph_row would use for
    this row: the SAME greedy bin-pack over bucket sizes, without building
    the shards. Budget planners must size per-device bytes from this (every
    device pads to ms >= m/D; bucket skew can push ms well above m/D)."""
    off = np.asarray(graph.bucket_slab_offsets, dtype=np.int64)
    sizes = np.diff(off)
    load = np.zeros(n_devices, dtype=np.int64)
    for b in np.argsort(-sizes, kind="stable"):
        load[int(np.argmin(load))] += sizes[b]
    return int(-(-load.max() // 8) * 8)


def shard_graph_row(ps, graph, mesh: Mesh,
                    data_host=None, norms_host=None) -> ShardedGraphRow:
    """Bucket-shard a SlabGraph row: greedy size-balanced assignment of whole
    buckets to devices; per-shard contiguous point/adjacency layout with
    monotone id remapping (preserves (dist, id) tie order inside a bucket,
    so sharded results are bit-identical to single-device ones).

    ``data_host``/``norms_host``: optional host copies of ps.data/ps.norms_sq.
    Callers sharding several rows should fetch once and pass them in — a
    per-row np.asarray(ps.data) is a full device→host transfer of the store."""
    axis = mesh.axis_names[0]
    D = int(np.prod(mesh.devices.shape))
    off = np.asarray(graph.bucket_slab_offsets, dtype=np.int64)
    nb = len(off) - 1
    sizes = np.diff(off)
    # greedy bin-pack: biggest bucket to least-loaded device
    load = np.zeros(D, dtype=np.int64)
    bucket_device = np.zeros(nb, dtype=np.int64)
    for b in np.argsort(-sizes, kind="stable"):
        d = int(np.argmin(load))
        bucket_device[b] = d
        load[d] += sizes[b]
    ms = int(-(-load.max() // 8) * 8)

    d_pad = ps.data.shape[1]
    R = graph.R
    pts = np.zeros((D, ms, d_pad), dtype=np.asarray(ps.data[:1]).dtype)
    nrm = np.zeros((D, ms), dtype=np.float32)
    nbrs = np.full((D, ms, R), -1, dtype=np.int32)
    l2g = np.full((D, ms), -1, dtype=np.int64)
    bucket_local_start = np.zeros(nb, dtype=np.int64)

    if data_host is None:
        data_host = np.asarray(ps.data)
    if norms_host is None:
        norms_host = np.asarray(ps.norms_sq)
    s2g = graph.slab_to_global_host
    fill = np.zeros(D, dtype=np.int64)
    for b in range(nb):
        d = int(bucket_device[b])
        lo, hi = int(off[b]), int(off[b + 1])
        sz = hi - lo
        start = int(fill[d])
        bucket_local_start[b] = start
        gids = s2g[lo:hi]
        pts[d, start:start + sz] = data_host[gids]
        nrm[d, start:start + sz] = norms_host[gids]
        l2g[d, start:start + sz] = gids
        rows = graph.nbrs_host[lo:hi]
        # slab ids -> shard-local: monotone shift inside the bucket
        nbrs[d, start:start + sz] = np.where(
            rows >= 0, rows - lo + start, -1)
        fill[d] += sz

    shard = NamedSharding(mesh, P(axis))
    return ShardedGraphRow(
        mesh,
        jax.device_put(jnp.asarray(pts.reshape(D * ms, d_pad)), shard),
        jax.device_put(jnp.asarray(nrm.reshape(D * ms)), shard),
        jax.device_put(jnp.asarray(nbrs.reshape(D * ms, R)), shard),
        l2g, bucket_device, bucket_local_start, ms,
    )


def _shard_map(fn, mesh, in_specs, out_specs):
    try:  # jax >= 0.8 moved shard_map out of experimental
        from jax import shard_map

        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map

        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def sharded_bucket_search(
    row: ShardedGraphRow,
    queries_padded: np.ndarray,  # [Q, d_pad] host f32
    buckets: np.ndarray,  # [Q] bucket id per query
    *, beam: int, k: int, cut=1.35, metric: str, norm_col=None,
    qd: int = 0,  # per-device query batch (0 = derive from routing)
    limit: int = 0,  # max visited (0 = the local shard size)
    degree_limit: int = 0,
    return_stats: bool = False,
):
    """Route each query to its bucket's owning device and search there.

    Returns (global_ids [Q, beam] int64 EMPTY_ID-padded, dists [Q, beam]);
    with ``return_stats`` additionally (num_visited [Q], dist_cmps [Q]).
    Identical results to searching the unsharded row (pinned by
    tests/test_sharded.py)."""
    D = row.n_devices
    Q = len(buckets)
    dev = row.bucket_device[buckets]  # [Q]
    counts = np.bincount(dev, minlength=D)
    if not qd:
        qd = max(8, int(-(-counts.max() // 8) * 8))
    d_pad = queries_padded.shape[1]
    qs = np.zeros((D, qd, d_pad), dtype=np.float32)
    st = np.zeros((D, qd), dtype=np.int32)
    act = np.zeros((D, qd), dtype=bool)
    # vectorized placement (round-2 verdict: no per-query Python loop):
    # stable-sort by device; each query's slot = rank within its device group
    order = np.argsort(dev, kind="stable")
    dev_sorted = dev[order]
    group_start = np.searchsorted(dev_sorted, dev_sorted, side="left")
    slot_sorted = np.arange(Q, dtype=np.int64) - group_start
    placing = np.empty((Q, 2), dtype=np.int64)  # (device, slot) per query
    placing[order, 0] = dev_sorted
    placing[order, 1] = slot_sorted
    qs[dev_sorted, slot_sorted] = queries_padded[order]
    st[dev_sorted, slot_sorted] = row.bucket_local_start[buckets[order]]
    act[dev_sorted, slot_sorted] = True

    axis = row.axis
    shard = NamedSharding(row.mesh, P(axis))
    qs_d = jax.device_put(jnp.asarray(qs.reshape(D * qd, d_pad)), shard)
    st_d = jax.device_put(jnp.asarray(st.reshape(D * qd)), shard)
    act_d = jax.device_put(jnp.asarray(act.reshape(D * qd)), shard)

    def local(pts, nrm, nbrs, q, s, a):
        res = batched_beam_search(
            pts, nrm, nbrs, jnp.arange(pts.shape[0], dtype=jnp.int32),
            q, s, beam=beam, k=k, cut=jnp.float32(cut),
            limit=jnp.int32(limit if limit else pts.shape[0]),
            metric=metric, active_in=a, degree_limit=degree_limit,
            norm_col=norm_col, identity_map=True,
        )
        return (res.frontier_ids, res.frontier_dists,
                res.num_visited, res.dist_cmps)

    f_ids, f_d, f_nv, f_dc = _shard_map(
        local, row.mesh,
        (P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        (P(axis), P(axis), P(axis), P(axis)),
    )(row.points_sh, row.norms_sh, row.nbrs_sh, qs_d, st_d, act_d)
    f_ids = np.asarray(f_ids).reshape(D, qd, beam)
    f_d = np.asarray(f_d).reshape(D, qd, beam)

    ids_loc = f_ids[placing[:, 0], placing[:, 1]]  # [Q, beam] shard-local
    valid = ids_loc != EMPTY_ID
    safe = np.clip(ids_loc, 0, row.ms - 1)
    out_i = np.where(
        valid, row.local_to_global[placing[:, 0, None], safe], int(EMPTY_ID)
    ).astype(np.int64)
    out_d = f_d[placing[:, 0], placing[:, 1]].astype(np.float32)
    out_d = np.where(valid, out_d, np.inf)
    if return_stats:
        nv = np.asarray(f_nv).reshape(D, qd)[placing[:, 0], placing[:, 1]]
        dc = np.asarray(f_dc).reshape(D, qd)[placing[:, 0], placing[:, 1]]
        return out_i, out_d, nv, dc
    return out_i, out_d


def _window_topk_host(gi, gd, win_lo, win_hi, k):
    """Host-side replica of ops.beam_search.window_filter_topk over GLOBAL
    ids: select, per row, the first k frontier entries inside [win_lo,
    win_hi) preserving frontier (dist, id) order. Returns (counts, ids, d)."""
    inw = (gi >= win_lo[:, None]) & (gi < win_hi[:, None]) & (gi != EMPTY_ID)
    counts = inw.sum(1)
    # stable-partition in-window entries to the front of each row
    order = np.argsort(~inw, axis=1, kind="stable")
    gi_s = np.take_along_axis(gi, order, 1)[:, :k]
    gd_s = np.take_along_axis(gd, order, 1)[:, :k]
    keep = np.arange(k)[None, :] < counts[:, None]
    return (counts,
            np.where(keep, gi_s, int(EMPTY_ID)),
            np.where(keep, gd_s, np.inf).astype(np.float32))


def sharded_doubling_postfilter(
    row: ShardedGraphRow,
    ps,  # PointSet (replicated): exact-scan tail + norms
    queries_padded: np.ndarray,  # [Q, d_pad] (full batch when qis given)
    buckets: np.ndarray,  # [T] bucket per task
    win_lo: np.ndarray,  # [T] global sorted-id window (inclusive)
    win_hi: np.ndarray,  # [T] (exclusive)
    qp,
    metric: str,
    *,
    qis: Optional[np.ndarray] = None,  # [T] task -> queries_padded row
    q_key=None,  # models.base._qkey of the FULL queries_padded
    stats=None,  # utils.stats.QueryStats (ids = qis)
):
    """Beam-doubling postfilter over a bucket-sharded row — the sequential
    (non-speculative) form of models.postfilter_vamana.doubling_postfilter
    with the SAME beam schedule, cap, final-multiply, and exact-scan-tail
    semantics, so a sharded tree query returns the same results as the
    single-device path (pinned by tests/test_sharded.py).

    DELIBERATE duplication: the dense path's schedule is interleaved with
    async device futures, speculative finals, and quantized rerank —
    parameterizing it over a search backend would obscure both. Any change
    to the schedule there (cap handling, final-pass condition, tail
    semantics) MUST be mirrored here; the parity tests
    (test_tree_shard_rows_matches_single_device,
    test_tree_shard_rows_doubling_cap_and_exact_tail) catch divergence.

    Pass the FULL padded query matrix plus ``qis``/``q_key`` when calling
    from a batch driver: the exact-scan tail then reuses the device query
    cache (q_rows gather) instead of churning it with per-call subset
    copies (CLAUDE.md "Tunnel economics").

    Returns (ids [T, k] global sorted ids, dists [T, k])."""
    from ..models.base import batched_range_bruteforce
    from ..models.postfilter_vamana import MAX_SAFE_BEAM

    nq = len(buckets)
    qrows = np.arange(nq, dtype=np.int64) if qis is None else np.asarray(qis)
    k = qp.k
    max_beam = min(qp.postfiltering_max_beam, MAX_SAFE_BEAM)
    exact_tail = qp.postfiltering_max_beam > max_beam
    cur_beam = np.minimum(np.full(nq, qp.beamSize, dtype=np.int64), max_beam)
    res_i = np.full((nq, k), int(EMPTY_ID), dtype=np.int64)
    res_d = np.full((nq, k), np.inf, dtype=np.float32)
    done = np.zeros(nq, dtype=bool)
    capped = np.zeros(nq, dtype=bool)
    dl = qp.degree_limit if qp.degree_limit < row.nbrs_sh.shape[-1] else 0

    def search(sel, b):
        gi, gd, nv, dc = sharded_bucket_search(
            row, queries_padded[qrows[sel]], buckets[sel], beam=int(b), k=0,
            cut=qp.cut, metric=metric, limit=int(qp.limit),
            degree_limit=dl,
            norm_col=ps.norm_col if ps.norm_col >= 0 else None,
            return_stats=True,
        )
        if stats is not None:
            stats.increment_visited(qrows[sel], nv)
            stats.increment_dist(qrows[sel], dc)
        return _window_topk_host(gi, gd, win_lo[sel], win_hi[sel], k)

    while not done.all():
        for b in np.unique(cur_beam[~done]):
            sel = np.nonzero(~done & (cur_beam == b))[0]
            counts, ti, td = search(sel, b)
            res_i[sel], res_d[sel] = ti, td
            enough = counts >= k
            done[sel[enough]] = True
            grow = sel[~enough]
            cur_beam[grow] *= 2
            hit_cap = cur_beam[grow] >= max_beam
            done[grow] |= hit_cap
            capped[grow[hit_cap]] = True
    if exact_tail and capped.any():
        sel = np.nonzero(capped)[0]
        bf_d, bf_i = batched_range_bruteforce(
            ps.data, ps.norms_sq, queries_padded,
            win_lo[sel].astype(np.int64), win_hi[sel].astype(np.int64),
            k, metric, norm_col=ps.norm_col if ps.norm_col >= 0 else None,
            q_rows=qrows[sel], q_key=q_key,
        )
        res_i[sel] = bf_i
        res_d[sel] = bf_d
        cur_beam[sel] = -1  # exact: skip the final pass
    final_beam = np.minimum(cur_beam * qp.final_beam_multiply, max_beam)
    needs_final = (final_beam > cur_beam) & (cur_beam > 0)
    for b in np.unique(final_beam[needs_final]):
        sel = np.nonzero(needs_final & (final_beam == b))[0]
        _, ti, td = search(sel, b)
        res_i[sel], res_d[sel] = ti, td
    return res_i, res_d


def sharded_scan_bruteforce(
    mesh: Mesh, data, norms_sq, queries, starts, ends, k: int, metric: str
):
    """Index-sharded exact range scan: point rows split across devices, each
    device computes a local masked top-k, partials merged via all_gather.

    `data` rows must be a multiple of the mesh size (pad with rows whose
    column ids fall outside every window)."""
    axis = mesh.axis_names[0]
    shard_n = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    data = jax.device_put(data, shard_n)
    norms_sq = jax.device_put(norms_sq, shard_n)
    queries = jax.device_put(queries, repl)
    starts = jax.device_put(jnp.asarray(starts, jnp.int32), repl)
    ends = jax.device_put(jnp.asarray(ends, jnp.int32), repl)
    return _sharded_scan_impl(
        data, norms_sq, queries, starts, ends, jnp.int32(0), k, metric, mesh, axis
    )

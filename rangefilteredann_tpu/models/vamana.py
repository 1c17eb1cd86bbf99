"""Vamana graph construction, batched for TPU.

TPU-native re-design of the reference's knn_index::batch_insert
(ref: ParlayANN/algorithms/vamana/index.h:123-135,211-313):

  * The exponential batch schedule is kept (it is what makes later searches
    run against a mostly-built graph), but *all buckets of a tree row build
    simultaneously*: each bucket runs the same relative schedule, so a global
    step is one batched beam search + one batched RobustPrune across every
    bucket's inserts at once. A row of 1024 tiny graphs costs the same device
    work as one big graph — this replaces the reference's per-bucket fork-join.
  * All distance work (insertion beam searches, prune domination tests,
    final adjacency sort) runs on the TPU; the reverse-edge grouping
    (ref: index.h:279-306, parlay::group_by_key) is integer bookkeeping and
    runs on the host over a mirrored adjacency.

Graphs are "slabs" (see ops/beam_search.py): adjacency [m_slab, R] of
slab-local int32 ids (-1 padded) + slab_to_global. For plain graphs the map is
an offset iota; buckets are contiguous slab spans given by bucket_slab_offsets.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.beam_search import batched_beam_search, default_expand
from ..ops.robust_prune import robust_prune
from ..ops.distances import gathered_distances
from ..ops.topk import EMPTY_ID
from ..params import BuildParams
from ..utils.data import PointSet
from .base import next_pow2

PRUNE_CHUNK = 2048  # rows per robust_prune launch (bounds the [m, C, d] gather)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(nbrs_dev, rows, vals):
    """In-place row update of the device adjacency (donated buffer — no copy,
    no host->device re-upload of the full [m, R] array per insert batch)."""
    return nbrs_dev.at[rows].set(vals, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_edges(nbrs_dev, rows, cols, vals):
    """In-place single-edge appends nbrs[rows, cols] = vals (drop on pad)."""
    return nbrs_dev.at[rows, cols].set(vals, mode="drop")


def _pad_to(arr, pad_value, size, width=None):
    """Pad dim 0 to exactly `size` rows (canonical scatter shapes)."""
    assert len(arr) <= size, (len(arr), size)
    if width is None:
        out = np.full((size,), pad_value, dtype=arr.dtype)
    else:
        out = np.full((size, width), pad_value, dtype=arr.dtype)
    out[: len(arr)] = arr
    return out


@dataclasses.dataclass
class SlabGraph:
    """Device adjacency + host mirror for one graph slab."""

    nbrs_dev: jax.Array  # [m, R] int32 slab ids, -1 pad
    slab_to_global_dev: jax.Array  # [m] int32
    nbrs_host: np.ndarray  # mirror of nbrs_dev
    degrees: np.ndarray  # [m] int32
    bucket_slab_offsets: np.ndarray  # [nb+1] slab-space bucket boundaries
    slab_to_global_host: np.ndarray = None  # [m] host copy of the slab map
    identity_s2g: bool = False  # slab ids == global ids (skip the map gather)

    @property
    def m(self) -> int:
        return self.nbrs_host.shape[0]

    @property
    def R(self) -> int:
        return self.nbrs_host.shape[1]

    def sync_to_device(self):
        self.nbrs_dev = jnp.asarray(self.nbrs_host)


def _batch_schedule(m: int, base: float = 2.0, max_fraction: float = 0.02):
    """Exponential insert batches (ref: index.h:228-255). Returns [(lo, hi))."""
    max_batch = min(int(max_fraction * m), 1_000_000)
    if max_batch == 0:
        max_batch = m
    out = []
    count, inc = 0, 0
    while count < m:
        if base**inc <= max_batch:
            lo = int(base**inc) - 1
            hi = min(int(base ** (inc + 1)), m) - 1
            count = hi
        else:
            lo = count
            hi = min(count + max_batch, m)
            count = hi
        if hi > lo:
            out.append((lo, hi))
        inc += 1
    return out


def _prune_batched(ps, s2g_dev, p_slab, cand_slab, alpha, R, metric,
                   chunk: int = PRUNE_CHUNK):
    """robust_prune over row chunks. Every chunk pads to the same `chunk`
    rows so one compiled (chunk, C) shape serves the whole build."""
    m = len(p_slab)
    out_ids = np.full((m, R), -1, dtype=np.int32)
    out_d = np.full((m, R), np.inf, dtype=np.float32)
    C = cand_slab.shape[1]
    for lo in range(0, m, chunk):
        chunk_p = p_slab[lo : lo + chunk]
        chunk_c = cand_slab[lo : lo + chunk]
        mp = chunk
        pp = np.full((mp,), -1, dtype=np.int32)
        cc = np.full((mp, C), -1, dtype=np.int32)
        pp[: len(chunk_p)] = chunk_p
        cc[: len(chunk_p)] = chunk_c
        ids, d = robust_prune(
            ps.data, ps.norms_sq, s2g_dev, jnp.asarray(pp), jnp.asarray(cc),
            jnp.float32(alpha), R=R, metric=metric,
            norm_col=ps.norm_col if ps.norm_col >= 0 else None,
        )
        ids, d = jax.device_get((ids, d))
        out_ids[lo : lo + chunk] = ids[: len(chunk_p)]
        out_d[lo : lo + chunk] = d[: len(chunk_p)]
    return out_ids, out_d


def build_vamana_graph(
    ps: PointSet,
    slab_to_global: np.ndarray,  # [m_slab] int64/int32
    bucket_slab_offsets: np.ndarray,  # [nb+1]
    bp: BuildParams,
    *,
    seed: int = 0,
    visited_cap: Optional[int] = None,
    verbose: bool = False,
) -> SlabGraph:
    """Build Vamana graphs over every bucket of a slab simultaneously."""
    rng = np.random.default_rng(seed)
    m_slab = int(bucket_slab_offsets[-1])
    nb = len(bucket_slab_offsets) - 1
    R, L, alpha = bp.R, bp.L, bp.alpha
    v_cap = visited_cap or (int(1.25 * L) + 64)
    metric = ps.metric

    s2g_dev = jnp.asarray(slab_to_global.astype(np.int32))
    identity = bool(
        m_slab == ps.n
        and np.array_equal(slab_to_global, np.arange(m_slab))
    )
    g = SlabGraph(
        nbrs_dev=jnp.full((m_slab, R), -1, dtype=jnp.int32),
        slab_to_global_dev=s2g_dev,
        nbrs_host=np.full((m_slab, R), -1, dtype=np.int32),
        degrees=np.zeros((m_slab,), dtype=np.int32),
        bucket_slab_offsets=np.asarray(bucket_slab_offsets),
        slab_to_global_host=slab_to_global.astype(np.int64),
        identity_s2g=identity,
    )

    # per-bucket random insertion orders + aligned schedules
    # (start point = bucket slab start, set before shuffling; ref: index.h:128)
    perms, schedules = [], []
    for b in range(nb):
        lo, hi = int(bucket_slab_offsets[b]), int(bucket_slab_offsets[b + 1])
        perms.append(lo + rng.permutation(hi - lo))
        schedules.append(_batch_schedule(hi - lo))
    n_steps = max(len(s) for s in schedules)
    bucket_starts = bucket_slab_offsets[:-1].astype(np.int32)

    # ONE padded batch shape for the whole build: every insert step, prune
    # chunk, and scatter pads to the same size, so the compiler sees a single
    # (mp, ...) shape per kernel instead of one per pow2 batch size (cold
    # compiles over the remote-compile path dominate otherwise)
    mb_max = max(
        sum(s[t][1] - s[t][0] for s in schedules if t < len(s))
        for t in range(n_steps)
    )
    mp = next_pow2(max(mb_max, 64))
    chunk = min(PRUNE_CHUNK, mp)
    rev_cap = next_pow2(2 * R)  # reverse-edge prune candidate width

    for t in range(n_steps):
        ins_list, start_list = [], []
        for b in range(nb):
            if t < len(schedules[b]):
                lo, hi = schedules[b][t]
                ins_list.append(perms[b][lo:hi])
                start_list.append(np.full(hi - lo, bucket_starts[b], dtype=np.int32))
        inserts = np.concatenate(ins_list).astype(np.int32)
        starts = np.concatenate(start_list)
        mb = len(inserts)
        ins_p = np.full((mp,), m_slab, dtype=np.int32)  # pad = out-of-range slab
        st_p = np.zeros((mp,), dtype=np.int32)
        act_p = np.zeros((mp,), dtype=bool)
        ins_p[:mb], st_p[:mb], act_p[:mb] = inserts, starts, True

        # 1) insertion beam searches against the current graph (device)
        ins_dev = jnp.asarray(ins_p)
        q_gid = s2g_dev[jnp.clip(ins_dev, 0, m_slab - 1)]
        queries = ps.data[q_gid].astype(jnp.float32)
        res = batched_beam_search(
            ps.data, ps.norms_sq, g.nbrs_dev, s2g_dev, queries,
            jnp.asarray(st_p),
            beam=L, k=0, cut=jnp.float32(1.0), limit=jnp.int32(m_slab),
            metric=metric, active_in=jnp.asarray(act_p), exclude=ins_dev,
            return_visited=True, visited_cap=v_cap,
            expand=default_expand(L),
            norm_col=ps.norm_col if ps.norm_col >= 0 else None,
            identity_map=identity,
        )
        visited = np.asarray(res.visited_ids)[:mb]
        visited = np.where(visited == int(EMPTY_ID), -1, visited).astype(np.int32)

        # 2) RobustPrune the visited lists -> new out-edges (device)
        new_out, new_d = _prune_batched(
            ps, s2g_dev, inserts, visited, alpha, R, metric, chunk=chunk
        )

        # 3) set out-edges of the inserted nodes — host mirror for the
        #    bookkeeping below, plus an in-place device scatter (donated
        #    buffer) instead of re-uploading the whole [m, R] adjacency
        g.nbrs_host[inserts] = new_out
        g.degrees[inserts] = (new_out >= 0).sum(axis=1)
        g.nbrs_dev = _scatter_rows(
            g.nbrs_dev,
            jnp.asarray(_pad_to(inserts.astype(np.int32), m_slab, mp)),
            jnp.asarray(_pad_to(new_out, -1, mp, R)),
        )

        # 4) reverse edges grouped by target (host bookkeeping,
        #    ref: index.h:279-306)
        u = np.repeat(inserts, R)
        v = new_out.reshape(-1)
        ok = v >= 0
        u, v = u[ok], v[ok]
        order = np.argsort(v, kind="stable")
        u, v = u[order], v[order]
        uniq_v, seg_starts, counts = np.unique(v, return_index=True, return_counts=True)

        fits = g.degrees[uniq_v] + counts <= R
        rank = np.arange(len(v)) - np.repeat(seg_starts, counts)
        fits_e = np.repeat(fits, counts)
        # appends: extend the adjacency rows in place (vectorized scatter)
        if fits_e.any():
            rows = v[fits_e]
            cols = g.degrees[rows] + rank[fits_e]
            g.nbrs_host[rows, cols] = u[fits_e]
            g.degrees[uniq_v[fits]] += counts[fits]
            g.nbrs_dev = _scatter_edges(
                g.nbrs_dev,
                jnp.asarray(_pad_to(rows.astype(np.int32), m_slab, mp * R)),
                jnp.asarray(_pad_to(cols.astype(np.int32), 0, mp * R)),
                jnp.asarray(_pad_to(u[fits_e].astype(np.int32), -1, mp * R)),
            )
        # overfull: RobustPrune(old neighbors + reverse candidates) with user alpha
        over_v = uniq_v[~fits]
        if len(over_v):
            over_c = counts[~fits]
            # fixed candidate width: old neighbors + up to rev_cap - R reverse
            # candidates (overflow beyond that is dropped; the reference keeps
            # all, but >rev_cap-R same-batch reverse edges to one node is
            # vanishingly rare and graph quality is recall-equivalent)
            cand = np.full((len(over_v), rev_cap), -1, dtype=np.int32)
            cand[:, :R] = g.nbrs_host[over_v]
            over_e = np.repeat(~fits, counts)
            row_of = np.repeat(np.arange(len(over_v)), over_c)
            keep = rank[over_e] < rev_cap - R
            cand[row_of[keep], R + rank[over_e][keep]] = u[over_e][keep]
            pruned, _ = _prune_batched(
                ps, s2g_dev, over_v.astype(np.int32), cand, alpha, R, metric,
                chunk=chunk,
            )
            g.nbrs_host[over_v] = pruned
            g.degrees[over_v] = (pruned >= 0).sum(axis=1)
            # over_v can exceed one batch width; scatter in mp-sized chunks
            for lo in range(0, len(over_v), mp):
                g.nbrs_dev = _scatter_rows(
                    g.nbrs_dev,
                    jnp.asarray(
                        _pad_to(over_v[lo : lo + mp].astype(np.int32), m_slab, mp)
                    ),
                    jnp.asarray(_pad_to(pruned[lo : lo + mp], -1, mp, R)),
                )
        if verbose:
            print(f"  vamana step {t + 1}/{n_steps}: inserted {mb}, "
                  f"visited avg {np.asarray(res.num_visited)[:mb].mean():.1f}")

    # final pass: sort each adjacency row by distance (ref: index.h:131-134)
    g.nbrs_host = sort_adjacency_rows(ps, g)
    g.sync_to_device()
    return g


def sort_adjacency_rows(ps: PointSet, g: SlabGraph) -> np.ndarray:
    """Per-node neighbor sort by distance, chunked on device."""
    m, R = g.nbrs_host.shape
    out = np.empty_like(g.nbrs_host)
    s2g = g.slab_to_global_dev
    chunk = 1 << 16
    for lo in range(0, m, chunk):
        hi = min(lo + chunk, m)
        rows = jnp.asarray(g.nbrs_host[lo:hi])
        out[lo:hi] = np.asarray(_sort_rows_kernel(
            ps.data, ps.norms_sq, s2g, rows, lo, ps.metric,
            norm_col=ps.norm_col if ps.norm_col >= 0 else None,
        ))
    return out


@functools.partial(jax.jit, static_argnames=("metric", "norm_col"))
def _sort_rows_kernel(data, norms_sq, s2g, rows, row_base, metric,
                      norm_col=None):
    m_slab = s2g.shape[0]
    valid = rows >= 0
    safe = jnp.clip(rows, 0, m_slab - 1)
    gid = s2g[safe]
    self_gid = s2g[jnp.clip(row_base + jnp.arange(rows.shape[0]), 0, m_slab - 1)]
    self_vecs = data[self_gid].astype(jnp.float32)
    if norm_col is not None:  # query side: keep the fused column out of ip
        self_vecs = self_vecs.at[:, norm_col].set(0.0)
    d = gathered_distances(
        self_vecs, data[gid], norms_sq[gid], metric
    )
    d = jnp.where(valid, d, jnp.inf)
    keys = jnp.where(valid, rows, EMPTY_ID)
    _, sorted_rows = jax.lax.sort((d, keys), num_keys=1)
    return jnp.where(sorted_rows == EMPTY_ID, -1, sorted_rows)

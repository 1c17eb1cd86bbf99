"""RangeFilterTreeIndex — the B-Window-Search-Tree (B-WST).

TPU-native equivalent of the reference's RangeFilterTreeIndex
(ref: src/range_filter_tree.h:34-550). Points are label-sorted; row 0 is one
bucket over everything and each next row splits every bucket into
`split_factor` near-equal children until bucket size <= cutoff
(ref: range_filter_tree.h:146-188). Every bucket carries a spatial index over
its contiguous slice: a Vamana graph (leaf="vamana") or brute force
(leaf="prefilter").

TPU redesign decisions:
  * One adjacency slab [n, R] per ROW (buckets partition [0, n)), so all
    buckets of a row are built in one aligned batched Vamana build
    (models/vamana.py) and all bucket queries of a row run as one dense
    batched beam search — a single compiled kernel shape serves every row.
  * Query routing (covering-bucket selection, descend-and-extend, fallbacks)
    is integer arithmetic on the host; the host emits three kinds of device
    work — single-shot bucket searches, beam-doubling postfilter searches,
    and brute-force fringe windows — each executed as dense grouped batches.

Three query methods (ref: range_filter_tree.h:70-82):
  * "fenwick" (default / tree query): O(split * log n) wholly-contained
    buckets + brute-forced fringe (ref: :297-401).
  * "optimized_postfilter": descend to the smallest bucket containing the
    whole range, beam-doubling postfilter there (ref: :403-471); falls back
    to fenwick when 4*|range| < cutoff, or when the bucket/range ratio
    exceeds min_query_to_bucket_ratio ("smart combined" — the reference's
    dispatch never actually routes the "smart_combined" string, see SURVEY.md
    §3.3; here it is an explicit method name doing what was intended).
  * "three_split": fenwick center at final_beam_multiply=1 + one optimized
    postfilter per uncovered side (ref: :473-540).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..ops.beam_search import batched_beam_search, default_expand
from ..ops.topk import EMPTY_ID
from ..params import (
    DEFAULT_CUTOFF,
    DEFAULT_SPLIT_FACTOR,
    BuildParams,
    QueryParams,
)
from ..utils.data import first_geq, make_pointset, pad_queries, sort_by_labels
from .base import (
    batched_range_bruteforce,
    finalize_output,
    pad_batch,
    whole_dataset_cache,
)
from .postfilter_vamana import doubling_postfilter
from .vamana import SlabGraph, build_vamana_graph


def build_offset_rows(n: int, cutoff: int, split_factor: int) -> List[np.ndarray]:
    """Bucket offsets per row, exact reference arithmetic
    (ref: range_filter_tree.h:139-188). Row i has split^i buckets; each parent
    of size s splits into (s - (ceil(s/split)-1)*split) large buckets of size
    ceil(s/split) followed by small buckets one smaller."""
    rows = [np.array([0, n], dtype=np.int64)]
    while rows[-1][1] > cutoff:
        parents = rows[-1]
        out = [0]
        for b in range(len(parents) - 1):
            start, end = int(parents[b]), int(parents[b + 1])
            size = end - start
            large = -(-size // split_factor)
            small = large - 1
            num_large = size - small * split_factor
            pos = start
            for i in range(split_factor):
                pos += large if i < num_large else small
                out.append(pos)
        child = np.array(out, dtype=np.int64)
        rows.append(child)
    return rows


def row_cache_filename(cache_path, bp, label_lo, label_hi, n, split, cutoff,
                       row) -> str:
    """Canonical B-WST row-cache filename (single source of truth — bench.py
    probes for cached trees with it)."""
    return os.path.join(
        cache_path,
        f"wst_{bp.L}_{bp.R}_{bp.alpha:.6f}_{label_lo:.6f}_{label_hi:.6f}_"
        f"{n}_{split}_{cutoff}_row{row}.npz",
    )


class RangeFilterTreeIndex:
    def __init__(
        self,
        points: np.ndarray,
        filter_values: np.ndarray,
        cutoff: int = DEFAULT_CUTOFF,
        split_factor: int = DEFAULT_SPLIT_FACTOR,
        build_params: Optional[BuildParams] = None,
        metric: str = "Euclidian",
        leaf: str = "vamana",
        seed: int = 0,
        device_rows_budget: "Optional[int]" = None,  # bytes of row adjacency
        # kept on device (LRU, rows re-upload on route); None = all resident.
        # The 10M+ regime: a B-WST's rows total ~2x n*R*4 bytes.
        require_cache: bool = False,  # raise instead of cold-building a row
    ):
        bp = build_params or BuildParams()
        self._require_cache = require_cache
        points = np.asarray(points)
        pts_sorted, self._labels_sorted, self._decoding = sort_by_labels(
            points, np.asarray(filter_values)
        )
        self._ps = make_pointset(pts_sorted, metric)
        self._cutoff = int(cutoff)
        self._split = int(split_factor)
        self._bp = bp
        self._leaf = leaf
        n = self._ps.n
        self._offsets = build_offset_rows(n, self._cutoff, self._split)
        self._mesh = None
        self._sharded = {}  # row -> parallel.sharded.ShardedGraphRow
        from .base import cache_fingerprint

        self._fp = cache_fingerprint(self._labels_sorted, pts_sorted)
        self._graphs: List[Optional[SlabGraph]] = [None] * len(self._offsets)
        if leaf == "vamana":
            s2g = np.arange(n, dtype=np.int64)
            for r, row_off in enumerate(self._offsets):
                self._graphs[r] = self._load_or_build_row(r, row_off, s2g, seed)
        from .base import RowResidency

        self._res = RowResidency(self._graphs, device_rows_budget)
        self._inline_attached: set = set()  # rows with inline blocks resident

    def _plan_inline(self, rows: np.ndarray, counts: np.ndarray) -> None:
        """Per-row int8 inline blocks for this batch's busiest rows
        (models/base.plan_row_inline; quantized scores are exact-reranked —
        the doubling path inside doubling_postfilter, the single-shot path
        in _run_single_shot)."""
        if self._leaf != "vamana":
            return
        from .base import plan_row_inline

        plan_row_inline(self._ps, self._graphs, self._sharded,
                        self._inline_attached, rows, counts)

    # ------------------------------------------------------------------ build
    def _row_cache_file(self, r: int) -> Optional[str]:
        bp = self._bp
        if not bp.cache_path:
            return None
        lo, hi = float(self._labels_sorted[0]), float(self._labels_sorted[-1])
        return row_cache_filename(
            bp.cache_path, bp, lo, hi, self._ps.n, self._split, self._cutoff, r
        )

    def _load_or_build_row(self, r, row_off, s2g, seed) -> SlabGraph:
        fname = self._row_cache_file(r)
        load_from = fname
        canon = None
        if r == 0 and self._bp.cache_path:
            # row 0 is ONE bucket over the whole dataset — the identical
            # build to the flat PostfilterVamanaIndex graph; share its cache
            canon = whole_dataset_cache(
                self._bp.cache_path, self._bp,
                float(self._labels_sorted[0]), float(self._labels_sorted[-1]),
                self._ps.n)
            if (fname and not os.path.exists(fname)
                    and os.path.exists(canon)):
                load_from = canon
        if load_from and os.path.exists(load_from):
            from .base import load_cached_nbrs

            nbrs = load_cached_nbrs(load_from, self._fp)
            if nbrs is not None:
                return SlabGraph(
                    nbrs_dev=jnp.asarray(nbrs),
                    slab_to_global_dev=jnp.asarray(s2g.astype(np.int32)),
                    nbrs_host=nbrs,
                    degrees=(nbrs >= 0).sum(axis=1).astype(np.int32),
                    bucket_slab_offsets=row_off,
                    slab_to_global_host=s2g,
                    identity_s2g=True,  # tree rows partition the sorted ids
                )
        if self._require_cache:
            raise FileNotFoundError(
                f"require_cache: row {r} cache absent or fingerprint-"
                f"mismatched ({fname})")
        g = build_vamana_graph(self._ps, s2g, row_off, self._bp, seed=seed + r)
        if fname:
            os.makedirs(os.path.dirname(fname), exist_ok=True)
            np.savez_compressed(fname, nbrs=g.nbrs_host, fingerprint=self._fp)
            if canon and not os.path.exists(canon):
                np.savez_compressed(canon, nbrs=g.nbrs_host,
                                    fingerprint=self._fp)
        return g

    def shard(self, mesh, shard_rows: bool = False) -> "RangeFilterTreeIndex":
        """Distribute over a device Mesh.

        Default: query sharding (point store + every row's adjacency
        replicated; per-query batches shard on the mesh axis).

        ``shard_rows=True`` additionally BUCKET-SHARDS rows across the
        mesh's devices (all multi-bucket rows when no ``device_rows_budget``
        is set; otherwise the largest rows first, until what stays
        replicated — plus each device's slice of the shards — fits the
        budget, which is read as per-device HBM available to this tree):
        each sharded row's buckets are bin-packed across devices
        (parallel.sharded.shard_graph_row) and its searches route each
        query to the owning device — the >HBM-per-chip regime (SURVEY
        §5h). Results are identical to the single-device path
        (tests/test_sharded.py::test_tree_shard_rows_matches_single_device).

        After shard() the row LRU is pinned (budget cleared): the
        replicated remainder fits by construction, and an LRU re-upload
        would land on ONE device, feeding mixed placements to later mesh
        searches."""
        from ..parallel.sharded import replicate_index, shard_graph_row

        self._sharded = {}
        if shard_rows:
            budget = self._res.budget
            D = int(np.prod(mesh.devices.shape))
            cand = {r: g for r, g in enumerate(self._graphs)
                    if g is not None and len(self._offsets[r]) > 2}
            # single-bucket rows (row 0) cannot shard; they replicate
            if budget is None:
                to_shard = sorted(cand)
            else:
                d_pad = int(self._ps.data.shape[1])
                item = int(np.dtype(self._ps.data.dtype).itemsize)
                fixed = sum(
                    g.device_bytes() for r, g in enumerate(self._graphs)
                    if g is not None and r not in cand)
                repl = {r: g.device_bytes() for r, g in cand.items()}
                shard_pd = 0  # per-device bytes of shard slices so far
                to_shard = []
                for r in sorted(cand, key=lambda r: repl[r], reverse=True):
                    if fixed + sum(repl.values()) + shard_pd <= budget:
                        break
                    g = cand[r]
                    to_shard.append(r)
                    # per-device slice: point rows + norms + adjacency,
                    # sized from the POST-PACKING rows-per-device (every
                    # device pads to the max shard; bucket skew makes that
                    # exceed m/D — round-3 advisor finding)
                    from ..parallel.sharded import shard_plan_rows_per_device

                    ms = shard_plan_rows_per_device(g, D)
                    shard_pd += ms * (d_pad * item + 4 + g.R * 4)
                    del repl[r]
            if to_shard:
                # one host fetch serves every row (a per-row np.asarray of
                # the point store would re-pull ~GBs over the tunnel)
                data_host = np.asarray(self._ps.data)
                norms_host = np.asarray(self._ps.norms_sq)
                for r in sorted(to_shard):
                    self._sharded[r] = shard_graph_row(
                        self._ps, cand[r], mesh,
                        data_host=data_host, norms_host=norms_host)
                    cand[r].evict_device()  # the shards now hold the row
        replicate_index(
            self._ps,
            [g for r, g in enumerate(self._graphs) if r not in self._sharded],
            mesh,
        )
        self._res.budget = None  # pin: every replicated row is resident now
        self._res.order = []
        self._mesh = mesh
        return self

    # ---------------------------------------------------------------- routing
    def _find_bucket_containing(self, row: int, index: int) -> int:
        """(ref: range_filter_tree.h:213-232)"""
        return int(np.searchsorted(self._offsets[row], index, side="right") - 1)

    def _find_largest_ranges(self, lo: int, hi: int):
        """Coarsest row whose buckets fit in [lo, hi) + the maximal run of
        wholly-contained buckets (ref: range_filter_tree.h:234-295).
        Returns (row, first_bucket, last_bucket_exclusive, cover_lo, cover_hi)
        or None."""
        range_size = hi - lo
        first_row = None
        for r, off in enumerate(self._offsets):
            # minus one: buckets in this row may be one smaller than the first
            if off[1] - off[0] - 1 <= range_size:
                first_row = r
                break
        if first_row is None:
            return None
        row = first_row
        first_idx = 0 if lo == 0 else self._find_bucket_containing(row, lo - 1) + 1
        if first_idx >= len(self._offsets[row]) - 1:
            return None
        start = int(self._offsets[row][first_idx])
        end = int(self._offsets[row][first_idx + 1])
        if end > hi:
            row += 1
            if row >= len(self._offsets):
                return None
            first_idx = 0 if lo == 0 else self._find_bucket_containing(row, lo - 1) + 1
            if first_idx >= len(self._offsets[row]) - 1:
                return None
            start = int(self._offsets[row][first_idx])
            end = int(self._offsets[row][first_idx + 1])
            if start < lo or end > hi:
                return None
        last_idx = first_idx + 1
        off = self._offsets[row]
        while last_idx < len(off) - 1:
            nxt = int(off[last_idx + 1])
            if nxt > hi:
                break
            last_idx += 1
            end = nxt
        return row, first_idx, last_idx, start, end

    def _plan_fenwick(self, lo: int, hi: int):
        """Covering buckets + fringe windows (ref: range_filter_tree.h:297-401).
        Returns (bucket_list [(row, bucket)], fringe [(s, e), ...])."""
        center = self._find_largest_ranges(lo, hi)
        buckets: List[Tuple[int, int]] = []
        if center is None:
            return buckets, [(lo, hi)]
        row, first_idx, last_idx, cover_lo, cover_hi = center
        for b in range(first_idx, last_idx):
            buckets.append((row, b))
        left_idx, right_idx = first_idx, last_idx - 1
        for r in range(row + 1, len(self._offsets)):
            off = self._offsets[r]
            left_idx *= self._split
            right_idx = right_idx * self._split + self._split - 1
            while left_idx > 0:
                nxt = int(off[left_idx - 1])
                if nxt < lo:
                    break
                cover_lo = nxt
                left_idx -= 1
                buckets.append((r, left_idx))
            while right_idx < len(off) - 2:
                nxt = int(off[right_idx + 2])
                if nxt > hi:
                    break
                cover_hi = nxt
                right_idx += 1
                buckets.append((r, right_idx))
        return buckets, [(lo, cover_lo), (cover_hi, hi)]

    def _plan_optimized(self, lo: int, hi: int, qp: QueryParams):
        """Smallest containing bucket or a fenwick fallback
        (ref: range_filter_tree.h:403-471). Returns ("fenwick", None) or
        ("bucket", (row, bucket))."""
        if 4 * (hi - lo) < self._cutoff:
            return ("fenwick", None)
        row, idx = 0, 0
        while row + 1 < len(self._offsets):
            nxt_row = row + 1
            off = self._offsets[nxt_row]
            found = None
            for cand in range(idx * self._split, idx * self._split + self._split):
                if cand >= len(off) - 1:
                    break
                if lo >= off[cand] and hi <= off[cand + 1]:
                    found = cand
            if found is None:
                break
            row, idx = nxt_row, found
        b_lo, b_hi = int(self._offsets[row][idx]), int(self._offsets[row][idx + 1])
        ratio = (b_hi - b_lo) / max(hi - lo, 1)
        if (
            qp.min_query_to_bucket_ratio is not None
            and ratio > qp.min_query_to_bucket_ratio
        ):
            return ("fenwick", None)
        return ("bucket", (row, idx))

    # -------------------------------------------------------------- execution
    def _run_single_shot(self, qis, rows, buckets, beams, queries_padded, k,
                         stats=None, degree_limit=0, cut=1.35,
                         limit=10_000_000, q_key=None):
        """Dense batched single-shot bucket searches, grouped by (row, beam).

        Single-shot is the collapsed form of the leaf doubling query when the
        bucket is wholly inside the filter range: every result passes the
        label filter, so the doubling loop runs once and only the
        final_beam_multiply pass matters (see module doc).
        Returns per-task (ids [T, k], dists [T, k]) in global sorted ids.
        """
        t_count = len(qis)
        out_i = np.full((t_count, k), int(EMPTY_ID), dtype=np.int64)
        out_d = np.full((t_count, k), np.inf, dtype=np.float32)
        if not t_count:
            return out_i, out_d
        # enqueue every (row, beam) group first, fetch ONCE: each blocking
        # device_get costs a ~30 ms tunnel dispatch floor, and a fenwick plan
        # routinely touches several rows per batch
        from .base import _qcache_rows, qcache_fill

        # one upload serves every (row, beam) group's gathered block —
        # fenwick tasks repeat queries across groups (models/base cache)
        _, q_dev = qcache_fill(queries_padded, q_key)
        launches = []
        for r in np.unique(rows):
            if r in self._sharded:
                # bucket-sharded row: route each task to its bucket's owning
                # device (blocking per group — the multi-chip >HBM path)
                from ..parallel.sharded import sharded_bucket_search

                row_sh = self._sharded[r]
                for beam in np.unique(beams[rows == r]):
                    sel = np.nonzero((rows == r) & (beams == beam))[0]
                    gi, gd, nv, dc = sharded_bucket_search(
                        row_sh, queries_padded[qis[sel]], buckets[sel],
                        beam=int(beam), k=0, cut=cut, metric=self._ps.metric,
                        limit=int(limit),
                        degree_limit=(0 if degree_limit >= row_sh.nbrs_sh.shape[-1]
                                      else int(degree_limit)),
                        norm_col=(self._ps.norm_col
                                  if self._ps.norm_col >= 0 else None),
                        return_stats=True,
                    )
                    if stats is not None:
                        stats.increment_visited(qis[sel], nv)
                        stats.increment_dist(qis[sel], dc)
                    gi, gd = gi[:, :k], gd[:, :k]
                    valid = gi != int(EMPTY_ID)
                    out_i[sel] = np.where(valid, gi, int(EMPTY_ID))
                    out_d[sel] = np.where(valid, gd, np.inf)
                continue
            g = self._res.touch(r)
            off = self._offsets[r]
            for beam in np.unique(beams[rows == r]):
                sel = np.nonzero((rows == r) & (beams == beam))[0]
                starts = off[buckets[sel]].astype(np.int32)
                tp = pad_batch(len(sel))
                st = np.zeros((tp,), np.int32)
                act = np.zeros((tp,), bool)
                st[: len(sel)] = starts
                act[: len(sel)] = True
                qs_dev = _qcache_rows(q_dev, qis[sel], tp, q_dev.shape[1])
                dl = 0 if degree_limit >= g.R else int(degree_limit)
                from ..ops.beam_search import (
                    pallas_beam_eligible, pallas_beam_search_safe)

                res = None
                if (g.nbr_vecs is not None and pallas_beam_eligible(
                        g, int(beam), default_expand(int(beam)), dl,
                        self._ps.metric)):
                    res = pallas_beam_search_safe(
                        self._ps, g, qs_dev, jnp.asarray(st),
                        beam=int(beam), limit=int(limit),
                        metric=self._ps.metric,
                        active_in=jnp.asarray(act))
                if res is None:
                    res = batched_beam_search(
                        self._ps.data, self._ps.norms_sq, g.nbrs_dev,
                        g.slab_to_global_dev,
                        qs_dev, jnp.asarray(st),
                        beam=int(beam), k=0, cut=jnp.float32(cut),
                        limit=jnp.int32(limit), metric=self._ps.metric,
                        active_in=jnp.asarray(act),
                        expand=default_expand(int(beam)),
                        degree_limit=dl,
                        norm_col=(self._ps.norm_col
                                  if self._ps.norm_col >= 0 else None),
                        identity_map=g.identity_s2g,
                        nbr_vecs=g.nbr_vecs, nbr_norms=g.nbr_norms,
                        nbr_scale=g.nbr_scale,
                    )
                if stats is not None:
                    stats.add_beam_result(qis[sel], res)
                if g.nbr_scale is not None:
                    # quantized inline: frontier order carries int8 rounding —
                    # exact-rerank the top-(k+slack) in fp32 (the doubling
                    # path does the same inside doubling_postfilter)
                    from ..ops.beam_search import exact_rerank

                    gsel = res.frontier_ids[:, : k + 8]
                    if not g.identity_s2g:
                        gsel = jnp.where(
                            gsel == EMPTY_ID, EMPTY_ID,
                            g.slab_to_global_dev[
                                jnp.clip(gsel, 0, g.m - 1)].astype(jnp.int32))
                    gi, gd = exact_rerank(
                        self._ps.data, self._ps.norms_sq, qs_dev, gsel, k,
                        self._ps.metric,
                        norm_col=(self._ps.norm_col
                                  if self._ps.norm_col >= 0 else None))
                    launches.append((sel, gi, gd))
                else:
                    launches.append(
                        (sel, res.frontier_ids, res.frontier_dists))
        fetched = jax.device_get([(fi, fd) for _, fi, fd in launches])
        for (sel, _, _), (fi, fd) in zip(launches, fetched):
            fi, fd = fi[: len(sel), :k], fd[: len(sel), :k]
            valid = fi != int(EMPTY_ID)
            out_i[sel] = np.where(valid, fi, int(EMPTY_ID))
            out_d[sel] = np.where(valid, fd, np.inf)
        return out_i, out_d

    def _run_doubling(self, qis, rows, buckets, win_lo, win_hi,
                      queries_padded, q_norms, qp, stats=None, q_key=None):
        """Beam-doubling bucket tasks grouped by row."""
        t_count = len(qis)
        k = qp.k
        out_i = np.full((t_count, k), int(EMPTY_ID), dtype=np.int64)
        out_d = np.full((t_count, k), np.inf, dtype=np.float32)
        if not t_count:
            return out_i, out_d
        for r in np.unique(rows):
            sel = np.nonzero(rows == r)[0]
            if r in self._sharded:
                from ..parallel.sharded import sharded_doubling_postfilter

                out_i[sel], out_d[sel] = sharded_doubling_postfilter(
                    self._sharded[r], self._ps, queries_padded,
                    buckets[sel], win_lo[sel], win_hi[sel], qp,
                    self._ps.metric, qis=qis[sel], q_key=q_key, stats=stats,
                )
                continue
            g = self._res.touch(r)
            off = self._offsets[r]
            starts = off[buckets[sel]].astype(np.int32)
            ids, dists = doubling_postfilter(
                self._ps, g, queries_padded, q_norms[qis[sel]],
                starts, win_lo[sel], win_hi[sel], qp, self._ps.metric,
                stats=stats, stat_ids=qis[sel], mesh=self._mesh,
                q_rows=qis[sel], q_key=q_key,
            )
            out_i[sel], out_d[sel] = ids, dists
        return out_i, out_d

    # ------------------------------------------------- native batched planning
    def _fenwick_tasks(self, plan, sel, beam, single, brute):
        """Append a plan_fenwick_batch result for queries `sel` to the flat
        task lists (fringe windows come from the plan itself)."""
        b_row, b_idx, b_cnt, fringe = plan
        cap = b_row.shape[1]
        mask = np.arange(cap)[None, :] < b_cnt[:, None]
        qi_rep = np.repeat(sel, b_cnt)
        rows_f = b_row[mask].astype(np.int64)
        idx_f = b_idx[mask]
        if self._leaf == "vamana":
            single.append(
                (qi_rep, rows_f, idx_f,
                 np.full(len(qi_rep), beam, dtype=np.int64))
            )
        else:
            # prefilter leaves: bucket searches are exact windows
            self._buckets_as_windows(qi_rep, rows_f, idx_f, brute)
        for c in range(0, 4, 2):
            fs, fe = fringe[:, c], fringe[:, c + 1]
            ok = fe > fs
            brute.append((sel[ok], fs[ok], fe[ok]))

    def _buckets_as_windows(self, qi_rep, rows_f, idx_f, brute):
        s = np.empty(len(rows_f), dtype=np.int64)
        e = np.empty(len(rows_f), dtype=np.int64)
        for r in np.unique(rows_f):
            m = rows_f == r
            s[m] = self._offsets[r][idx_f[m]]
            e[m] = self._offsets[r][idx_f[m] + 1]
        brute.append((qi_rep, s, e))

    def _plan_batch_native(self, query_method, lo_idx, hi_idx, hi_incl, qp):
        """Plan every query with the native host runtime (rangefilteredann_tpu/
        native.py -> native/winann_native.cpp), replacing the per-query Python
        planner loop with three batched C++ passes. Returns flat task arrays
        (single, dbl, brute) or None when the library is unavailable (caller
        falls back to the Python planner). Parity with the Python planner is
        pytest-enforced (tests/test_native.py)."""
        if not native.available():
            return None
        lo = lo_idx.astype(np.int64)
        hi = hi_idx.astype(np.int64)
        single = []  # (qi, row, bucket, beam)
        dbl = []  # (qi, row, bucket, win_lo, win_hi)
        brute = []  # (qi, s, e)

        beam_single = (
            qp.beamSize
            if self._leaf != "vamana"
            else min(qp.beamSize * qp.final_beam_multiply, qp.postfiltering_max_beam)
        )

        def add_fenwick(sel, lo_s, hi_s, beam):
            if not len(sel):
                return True
            plan = native.plan_fenwick_batch(self._offsets, self._split, lo_s, hi_s)
            if plan is None:
                return False  # cap overflow -> Python fallback
            self._fenwick_tasks(plan, sel, beam, single, brute)
            return True

        def add_optimized(sel, lo_s, hi_s, win_hi):
            """Optimized-postfilter routing over side ranges [lo_s, hi_s);
            doubling windows use win_hi (inclusive-top extension)."""
            if not len(sel):
                return True
            plan = native.plan_optimized_batch(
                self._offsets, self._split, self._cutoff,
                qp.min_query_to_bucket_ratio, lo_s, hi_s,
            )
            if plan is None:
                return False
            kind, row, idx = plan
            is_b = kind == 1
            if self._leaf == "vamana":
                dbl.append(
                    (sel[is_b], row[is_b].astype(np.int64), idx[is_b],
                     lo_s[is_b], win_hi[is_b])
                )
            else:
                # prefilter leaves: the covering bucket's query IS an exact
                # scan of bucket ∩ range = [lo_s, hi_s) (the bucket covers the
                # whole range) — no doubling (ref: leaf ->query dispatch)
                brute.append((sel[is_b], lo_s[is_b], hi_s[is_b]))
            return add_fenwick(sel[~is_b], lo_s[~is_b], hi_s[~is_b], beam_single)

        act = np.nonzero(hi > lo)[0]
        if query_method == "optimized_postfilter":
            ok = add_optimized(act, lo[act], hi[act], hi_incl.astype(np.int64)[act])
        elif query_method == "three_split":
            centers = native.plan_center_batch(self._offsets, lo[act], hi[act])
            if centers is None:
                return None
            found, c_row, c_first, c_last, c_lo, c_hi = centers
            # no center -> fenwick with final_beam_multiply forced to 1
            nf = act[~found]
            ok = add_fenwick(nf, lo[nf], hi[nf], qp.beamSize)
            f_sel = act[found]
            runs = (c_last - c_first)[found]
            qi_rep = np.repeat(f_sel, runs)
            rows_rep = np.repeat(c_row[found].astype(np.int64), runs)
            idx_rep = (
                np.concatenate(
                    [np.arange(f, l, dtype=np.int64)
                     for f, l in zip(c_first[found], c_last[found])]
                )
                if len(f_sel)
                else np.zeros(0, dtype=np.int64)
            )
            if self._leaf == "vamana":
                single.append(
                    (qi_rep, rows_rep, idx_rep,
                     np.full(len(qi_rep), qp.beamSize, dtype=np.int64))
                )  # fm forced to 1 (ref: :490-511)
            else:
                self._buckets_as_windows(qi_rep, rows_rep, idx_rep, brute)
            # one optimized-postfilter call per uncovered side (ref: :513-528)
            cover_lo, cover_hi = c_lo[found], c_hi[found]
            l_m = cover_lo > lo[f_sel]
            left = f_sel[l_m]
            ok = ok and add_optimized(left, lo[left], cover_lo[l_m], cover_lo[l_m])
            r_m = hi[f_sel] > cover_hi
            right = f_sel[r_m]
            # the right side's doubling window top is the ORIGINAL filter top,
            # inclusive of hi-label ties (ref: right_range keeps range.second
            # and the leaf label filter is inclusive there) — same extension
            # the direct optimized_postfilter path gets via hi_incl
            ok = ok and add_optimized(
                right, cover_hi[r_m], hi[right],
                hi_incl.astype(np.int64)[right])
        else:  # "fenwick" and anything unrecognized (ref dispatch :76-81)
            ok = add_fenwick(act, lo[act], hi[act], beam_single)
        if not ok:
            return None

        def cat(parts, width):
            cols = []
            for i in range(width):
                chunks = [p[i] for p in parts if len(p[0])]
                cols.append(
                    np.concatenate(chunks).astype(np.int64)
                    if chunks else np.zeros(0, dtype=np.int64)
                )
            return tuple(cols)

        return cat(single, 4), cat(dbl, 5), cat(brute, 3)

    # ----------------------------------------------------------------- search
    def _plan_batch_python(self, query_method, lo_idx, hi_idx, hi_incl, qp,
                           num_queries):
        """Pure-Python per-query planner (fallback + parity oracle for the
        native planner). Returns the same flat task arrays."""
        single_tasks, single_beams = [], []
        dbl_tasks, dbl_wins = [], []
        brute_tasks = []  # (qi, s, e)

        def emit_fenwick(qi, lo, hi, fm_forced_one=False):
            buckets, fringe = self._plan_fenwick(lo, hi)
            if self._leaf == "vamana":
                beam_eff = qp.beamSize if fm_forced_one else min(
                    qp.beamSize * qp.final_beam_multiply, qp.postfiltering_max_beam
                )
                for (r, b) in buckets:
                    single_tasks.append((qi, r, b))
                    single_beams.append(beam_eff)
            else:  # prefilter leaves: bucket searches are exact windows
                for (r, b) in buckets:
                    brute_tasks.append(
                        (qi, int(self._offsets[r][b]), int(self._offsets[r][b + 1]))
                    )
            for (s, e) in fringe:
                if e > s:
                    brute_tasks.append((qi, s, e))

        def emit_optimized(qi, lo, hi, win_hi=None):
            kind, where = self._plan_optimized(lo, hi, qp)
            if kind == "fenwick":
                emit_fenwick(qi, lo, hi)
            elif self._leaf != "vamana":
                # prefilter leaves: covering-bucket query = exact [lo, hi) scan
                brute_tasks.append((qi, lo, hi))
            else:
                r, b = where
                dbl_tasks.append((qi, r, b))
                dbl_wins.append((lo, win_hi if win_hi is not None else hi))

        for qi in range(num_queries):
            lo, hi = int(lo_idx[qi]), int(hi_idx[qi])
            if hi <= lo:  # empty range (ref: check_empty, :191-203)
                continue
            if query_method == "optimized_postfilter":
                emit_optimized(qi, lo, hi, win_hi=int(hi_incl[qi]))
            elif query_method == "three_split":
                center = self._find_largest_ranges(lo, hi)
                if center is None:
                    emit_fenwick(qi, lo, hi, fm_forced_one=True)
                    continue
                row, first_idx, last_idx, cover_lo, cover_hi = center
                if self._leaf == "vamana":
                    for b in range(first_idx, last_idx):
                        single_tasks.append((qi, row, b))
                        single_beams.append(qp.beamSize)  # fm forced to 1
                else:
                    for b in range(first_idx, last_idx):
                        brute_tasks.append(
                            (qi, int(self._offsets[row][b]),
                             int(self._offsets[row][b + 1]))
                        )
                if cover_lo > lo:
                    emit_optimized(qi, lo, cover_lo)
                if hi > cover_hi:
                    # inclusive-top extension for the right side's doubling
                    # window (the native planner does the same)
                    emit_optimized(qi, cover_hi, hi, win_hi=int(hi_incl[qi]))
            else:  # "fenwick" and anything unrecognized (ref dispatch :76-81)
                emit_fenwick(qi, lo, hi)

        def arr(rows_of, width):
            if not rows_of:
                return tuple(np.zeros(0, dtype=np.int64) for _ in range(width))
            a = np.asarray(rows_of, dtype=np.int64)
            return tuple(a[:, i] for i in range(width))

        s_qi, s_row, s_bkt = arr(single_tasks, 3)
        d_qi, d_row, d_bkt = arr(dbl_tasks, 3)
        d_lo, d_hi = arr(dbl_wins, 2)
        b_qi, b_s, b_e = arr(brute_tasks, 3)
        return (
            (s_qi, s_row, s_bkt, np.asarray(single_beams, dtype=np.int64)),
            (d_qi, d_row, d_bkt, d_lo, d_hi),
            (b_qi, b_s, b_e),
        )

    def batch_search(
        self,
        queries: np.ndarray,
        filters: Sequence[Tuple[float, float]],
        num_queries: int,
        query_method: str = "fenwick",
        query_params: Optional[QueryParams] = None,
        stats=None,  # optional utils.stats.QueryStats (ref: utils/stats.h role)
    ) -> Tuple[np.ndarray, np.ndarray]:
        qp = query_params
        queries = np.asarray(queries, dtype=np.float32)[:num_queries]
        filters = np.asarray(filters, dtype=np.float64)[:num_queries]
        k = qp.k
        qpad = pad_queries(queries, self._ps.d, self._ps.d_pad)
        q_norms = np.einsum("qd,qd->q", queries, queries).astype(np.float32)
        lo_idx = first_geq(self._labels_sorted, filters[:, 0])
        hi_idx = first_geq(self._labels_sorted, filters[:, 1])
        # the Vamana leaf's label filter is inclusive at the top end
        # (ref: postfilter_vamana.h:236-237), unlike the index arithmetic used
        # for planning — extend doubling windows to include hi-label ties
        hi_incl = np.searchsorted(self._labels_sorted, filters[:, 1], side="right")

        plan = self._plan_batch_native(query_method, lo_idx, hi_idx, hi_incl, qp)
        if plan is None:
            plan = self._plan_batch_python(
                query_method, lo_idx, hi_idx, hi_incl, qp, num_queries
            )
        (s_qi, s_row, s_bkt, s_beam), (d_qi, d_row, d_bkt, d_wlo, d_whi), \
            (b_qi, b_s, b_e) = plan

        # inline blocks for the busiest rows of THIS batch (budget-gated)
        all_rows = np.concatenate([s_row, d_row]).astype(np.int64)
        if len(all_rows) and self._mesh is None:
            urows, ucounts = np.unique(all_rows, return_counts=True)
            self._plan_inline(urows, ucounts)

        # ---- execute the three phases as dense batches ----
        # hash the padded batch ONCE; every phase (and every row inside the
        # doubling phase) reuses the key instead of re-checksumming ~5 MB
        from .base import _qkey

        q_key = _qkey(qpad)
        s_i, s_d = self._run_single_shot(
            s_qi, s_row, s_bkt, s_beam, qpad, k, stats=stats,
            degree_limit=qp.degree_limit, cut=qp.cut, limit=qp.limit,
            q_key=q_key,
        )
        d_i, d_d = self._run_doubling(
            d_qi, d_row, d_bkt, d_wlo, d_whi, qpad, q_norms, qp, stats=stats,
            q_key=q_key,
        )
        if len(b_qi):
            b_d, b_i = batched_range_bruteforce(
                self._ps.data, self._ps.norms_sq, qpad, b_s, b_e, k,
                self._ps.metric, norm_col=self._ps.norm_col, q_rows=b_qi,
                q_key=q_key,
            )
        else:
            b_i = np.zeros((0, k), dtype=np.int64)
            b_d = np.zeros((0, k), dtype=np.float32)

        # ---- per-query merge: top-k across parts (disjoint, so no dedup;
        # ref: range_filter_tree.h:399,542-549) ----
        part_ids = np.concatenate([s_i, d_i, np.asarray(b_i, dtype=np.int64)])
        part_d = np.concatenate([s_d, d_d, np.asarray(b_d, dtype=np.float32)])
        part_qi = np.concatenate([s_qi, d_qi, b_qi]).astype(np.int32)
        merged = native.merge_topk_parts(
            part_ids, part_d, part_qi, num_queries, int(EMPTY_ID)
        ) if len(part_qi) else None
        if merged is not None:
            out_i, out_d = merged
            out_d = out_d.astype(np.float32)
        else:
            out_i = np.full((num_queries, k), int(EMPTY_ID), dtype=np.int64)
            out_d = np.full((num_queries, k), np.inf, dtype=np.float32)
            if len(part_qi):
                qi_rep = np.repeat(part_qi, k)
                flat_i = part_ids.reshape(-1)
                flat_dd = part_d.reshape(-1)
                order = np.lexsort((flat_i, flat_dd, qi_rep))
                qs = qi_rep[order]
                starts = np.searchsorted(qs, np.arange(num_queries))
                rank = np.arange(len(qs)) - starts[qs]
                take = rank < k
                out_i[qs[take], rank[take]] = flat_i[order][take]
                out_d[qs[take], rank[take]] = flat_dd[order][take]

        return finalize_output(
            out_d, out_i, self._decoding, q_norms, self._ps.metric, pad_id=0
        )

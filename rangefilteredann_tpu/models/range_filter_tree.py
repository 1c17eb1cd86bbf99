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

import jax.numpy as jnp
import numpy as np

from ..ops.beam_search import batched_beam_search
from ..ops.topk import EMPTY_ID
from ..params import (
    DEFAULT_CUTOFF,
    DEFAULT_SPLIT_FACTOR,
    BuildParams,
    QueryParams,
)
from ..utils.data import first_geq, make_pointset, pad_queries, sort_by_labels
from .base import batched_range_bruteforce, finalize_output, next_pow2
from .postfilter_vamana import _filter_topk, doubling_postfilter
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
    ):
        bp = build_params or BuildParams()
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
        self._graphs: List[Optional[SlabGraph]] = [None] * len(self._offsets)
        if leaf == "vamana":
            s2g = np.arange(n, dtype=np.int64)
            for r, row_off in enumerate(self._offsets):
                self._graphs[r] = self._load_or_build_row(r, row_off, s2g, seed)

    # ------------------------------------------------------------------ build
    def _row_cache_file(self, r: int) -> Optional[str]:
        bp = self._bp
        if not bp.cache_path:
            return None
        lo, hi = float(self._labels_sorted[0]), float(self._labels_sorted[-1])
        return os.path.join(
            bp.cache_path,
            f"wst_{bp.L}_{bp.R}_{bp.alpha:.6f}_{lo:.6f}_{hi:.6f}_"
            f"{self._ps.n}_{self._split}_{self._cutoff}_row{r}.npz",
        )

    def _load_or_build_row(self, r, row_off, s2g, seed) -> SlabGraph:
        fname = self._row_cache_file(r)
        if fname and os.path.exists(fname):
            with np.load(fname) as z:
                nbrs = z["nbrs"]
            return SlabGraph(
                nbrs_dev=jnp.asarray(nbrs),
                slab_to_global_dev=jnp.asarray(s2g.astype(np.int32)),
                nbrs_host=nbrs,
                degrees=(nbrs >= 0).sum(axis=1).astype(np.int32),
                bucket_slab_offsets=row_off,
                slab_to_global_host=s2g,
            )
        g = build_vamana_graph(self._ps, s2g, row_off, self._bp, seed=seed + r)
        if fname:
            os.makedirs(os.path.dirname(fname), exist_ok=True)
            np.savez_compressed(fname, nbrs=g.nbrs_host)
        return g

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
    def _run_single_shot(self, tasks, queries_padded, q_norms, beam_by_task, k):
        """Dense batched single-shot bucket searches, grouped by (row, beam).

        tasks: list of (qi, row, bucket). Single-shot is the collapsed form of
        the leaf doubling query when the bucket is wholly inside the filter
        range: every result passes the label filter, so the doubling loop runs
        once and only the final_beam_multiply pass matters (see module doc).
        Returns per-task (ids [T, k], dists [T, k]) in global sorted ids.
        """
        t_count = len(tasks)
        out_i = np.full((t_count, k), int(EMPTY_ID), dtype=np.int64)
        out_d = np.full((t_count, k), np.inf, dtype=np.float32)
        if not t_count:
            return out_i, out_d
        rows = np.array([t[1] for t in tasks])
        qis = np.array([t[0] for t in tasks])
        buckets = np.array([t[2] for t in tasks])
        for r in np.unique(rows):
            g = self._graphs[r]
            off = self._offsets[r]
            for beam in np.unique(beam_by_task[rows == r]):
                sel = np.nonzero((rows == r) & (beam_by_task == beam))[0]
                starts = off[buckets[sel]].astype(np.int32)
                tp = next_pow2(max(len(sel), 64))
                qs = np.zeros((tp, queries_padded.shape[1]), np.float32)
                st = np.zeros((tp,), np.int32)
                act = np.zeros((tp,), bool)
                qs[: len(sel)] = queries_padded[qis[sel]]
                st[: len(sel)] = starts
                act[: len(sel)] = True
                res = batched_beam_search(
                    self._ps.data, self._ps.norms_sq, g.nbrs_dev,
                    g.slab_to_global_dev, jnp.asarray(qs), jnp.asarray(st),
                    beam=int(beam), k=0, cut=jnp.float32(1.35),
                    limit=jnp.int32(10_000_000), metric=self._ps.metric,
                    active_in=jnp.asarray(act),
                )
                fi = np.asarray(res.frontier_ids)[: len(sel), :k]
                fd = np.asarray(res.frontier_dists)[: len(sel), :k]
                valid = fi != int(EMPTY_ID)
                out_i[sel] = np.where(valid, fi, int(EMPTY_ID))
                out_d[sel] = np.where(valid, fd, np.inf)
        return out_i, out_d

    def _run_doubling(self, tasks, queries_padded, q_norms, wins, qp):
        """Beam-doubling bucket tasks grouped by row.

        tasks: list of (qi, row, bucket); wins: [(win_lo, win_hi)] per task.
        """
        t_count = len(tasks)
        k = qp.k
        out_i = np.full((t_count, k), int(EMPTY_ID), dtype=np.int64)
        out_d = np.full((t_count, k), np.inf, dtype=np.float32)
        if not t_count:
            return out_i, out_d
        rows = np.array([t[1] for t in tasks])
        qis = np.array([t[0] for t in tasks])
        buckets = np.array([t[2] for t in tasks])
        wins = np.asarray(wins, dtype=np.int64).reshape(t_count, 2)
        for r in np.unique(rows):
            sel = np.nonzero(rows == r)[0]
            g = self._graphs[r]
            off = self._offsets[r]
            starts = off[buckets[sel]].astype(np.int32)
            ids, dists = doubling_postfilter(
                self._ps, g, queries_padded[qis[sel]], q_norms[qis[sel]],
                starts, wins[sel, 0], wins[sel, 1], qp, self._ps.metric,
            )
            out_i[sel], out_d[sel] = ids, dists
        return out_i, out_d

    # ----------------------------------------------------------------- search
    def batch_search(
        self,
        queries: np.ndarray,
        filters: Sequence[Tuple[float, float]],
        num_queries: int,
        query_method: str = "fenwick",
        query_params: Optional[QueryParams] = None,
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

        # per-query plans -> flat task lists
        single_tasks, single_beams = [], []
        dbl_tasks, dbl_wins = [], []
        brute_tasks = []  # (qi, s, e)
        per_query_parts: List[List[Tuple[str, int]]] = [[] for _ in range(num_queries)]

        def emit_fenwick(qi, lo, hi, fm_forced_one=False):
            buckets, fringe = self._plan_fenwick(lo, hi)
            if self._leaf == "vamana":
                beam_eff = qp.beamSize if fm_forced_one else min(
                    qp.beamSize * qp.final_beam_multiply, qp.postfiltering_max_beam
                )
                for (r, b) in buckets:
                    per_query_parts[qi].append(("single", len(single_tasks)))
                    single_tasks.append((qi, r, b))
                    single_beams.append(beam_eff)
            else:  # prefilter leaves: bucket searches are exact windows
                for (r, b) in buckets:
                    per_query_parts[qi].append(("brute", len(brute_tasks)))
                    brute_tasks.append(
                        (qi, int(self._offsets[r][b]), int(self._offsets[r][b + 1]))
                    )
            for (s, e) in fringe:
                if e > s:
                    per_query_parts[qi].append(("brute", len(brute_tasks)))
                    brute_tasks.append((qi, s, e))

        def emit_optimized(qi, lo, hi, win_hi=None):
            kind, where = self._plan_optimized(lo, hi, qp)
            if kind == "fenwick":
                emit_fenwick(qi, lo, hi)
            else:
                r, b = where
                per_query_parts[qi].append(("dbl", len(dbl_tasks)))
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
                        per_query_parts[qi].append(("single", len(single_tasks)))
                        single_tasks.append((qi, row, b))
                        single_beams.append(qp.beamSize)  # fm forced to 1
                else:
                    for b in range(first_idx, last_idx):
                        per_query_parts[qi].append(("brute", len(brute_tasks)))
                        brute_tasks.append(
                            (qi, int(self._offsets[row][b]), int(self._offsets[row][b + 1]))
                        )
                if cover_lo > lo:
                    emit_optimized(qi, lo, cover_lo)
                if hi > cover_hi:
                    emit_optimized(qi, cover_hi, hi)
            else:  # "fenwick" and anything unrecognized (ref dispatch :76-81)
                emit_fenwick(qi, lo, hi)

        # ---- execute the three phases as dense batches ----
        s_i, s_d = self._run_single_shot(
            single_tasks, qpad, q_norms, np.array(single_beams, dtype=np.int64), k
        ) if single_tasks else (None, None)
        d_i, d_d = self._run_doubling(dbl_tasks, qpad, q_norms, dbl_wins, qp)
        if brute_tasks:
            b_qis = np.array([t[0] for t in brute_tasks])
            b_s = np.array([t[1] for t in brute_tasks], dtype=np.int64)
            b_e = np.array([t[2] for t in brute_tasks], dtype=np.int64)
            b_d, b_i = batched_range_bruteforce(
                self._ps.data, self._ps.norms_sq, qpad[b_qis], b_s, b_e, k,
                self._ps.metric,
            )

        # ---- per-query merge: top-k across parts ----
        out_i = np.full((num_queries, k), int(EMPTY_ID), dtype=np.int64)
        out_d = np.full((num_queries, k), np.inf, dtype=np.float32)
        for qi in range(num_queries):
            parts = per_query_parts[qi]
            if not parts:
                continue
            ids_list, d_list = [], []
            for kind, t in parts:
                if kind == "single":
                    ids_list.append(s_i[t]); d_list.append(s_d[t])
                elif kind == "dbl":
                    ids_list.append(d_i[t]); d_list.append(d_d[t])
                else:
                    ids_list.append(b_i[t]); d_list.append(b_d[t])
            ids_all = np.concatenate(ids_list)
            d_all = np.concatenate(d_list)
            order = np.lexsort((ids_all, d_all))[:k]
            out_i[qi, : len(order)] = ids_all[order]
            out_d[qi, : len(order)] = d_all[order]

        return finalize_output(
            out_d, out_i, self._decoding, q_norms, self._ps.metric, pad_id=0
        )

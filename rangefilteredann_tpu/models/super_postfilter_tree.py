"""SuperOptimizedPostfilterTree — overlapping-bucket postfiltering.

TPU-native equivalent of the reference's SuperOptimizedPostfilterTree
(ref: src/super_optimized_postfilter_tree.h:29-271): rows of fixed-size
*overlapping* buckets — row r+1 bucket size = prev/split_factor (truncated
float division, ref: :148-149), start stride = ceil(size * shift_factor)
(ref: :150) — so any query range of width <= (1-shift)*size fits entirely in
some bucket with bounded blowup. Queries scan rows smallest-first for the
smallest bucket containing the range, then run the beam-doubling postfilter
on that single bucket (ref: :187-270).

TPU redesign: overlapping buckets can't share one adjacency over the sorted
ids, so each row is a "slab" — buckets laid out contiguously in slab space
with an explicit slab->global map (ops/beam_search.py works identically on
slabs, so the same compiled kernel serves plain and overlapping rows). All
buckets of a row still build in ONE aligned batched Vamana build.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .. import native
from ..ops.topk import EMPTY_ID
from ..params import (
    DEFAULT_CUTOFF,
    DEFAULT_SHIFT_FACTOR,
    DEFAULT_SPLIT_FACTOR,
    BuildParams,
    QueryParams,
)
from ..utils.data import first_geq, make_pointset, pad_queries, sort_by_labels
from .base import finalize_output
from .postfilter_vamana import doubling_postfilter
from .vamana import SlabGraph, build_vamana_graph


def super_row_layout(n: int, cutoff: int, split_factor: float, shift_factor: float):
    """Per-row (bucket_size, bucket_shift, num_buckets), reference arithmetic
    (ref: super_optimized_postfilter_tree.h:145-161). Row 0 = whole dataset."""
    rows = [(n, 0, 1)]
    while rows[-1][0] > cutoff:
        last = rows[-1][0]
        bucket_size = int((last + split_factor - 1) / split_factor)
        bucket_shift = math.ceil(bucket_size * shift_factor)
        num_buckets = (n - bucket_size + bucket_shift - 1) // bucket_shift + 1
        rows.append((bucket_size, bucket_shift, num_buckets))
    return rows


def super_row_cache_filename(cache_path, bp, label_lo, label_hi, n, split,
                             shift, cutoff, row) -> str:
    """Canonical super-tree row-cache filename (single source of truth)."""
    return os.path.join(
        cache_path,
        f"super_{bp.L}_{bp.R}_{bp.alpha:.6f}_{label_lo:.6f}_{label_hi:.6f}_"
        f"{n}_{split:.3f}_{shift:.3f}_{cutoff}_row{row}.npz",
    )


class SuperOptimizedPostfilterTree:
    def __init__(
        self,
        points: np.ndarray,
        filter_values: np.ndarray,
        cutoff: int = DEFAULT_CUTOFF,
        split_factor: float = float(DEFAULT_SPLIT_FACTOR),
        shift_factor: float = DEFAULT_SHIFT_FACTOR,
        build_params: Optional[BuildParams] = None,
        metric: str = "Euclidian",
        seed: int = 0,
        device_rows_budget: Optional[int] = None,  # bytes of row adjacency
        # kept on device (LRU, rows re-upload on route); None = all resident
        require_cache: bool = False,  # raise instead of cold-building a row
    ):
        self._require_cache = require_cache
        if split_factor <= 1:
            raise ValueError("split_factor must be greater than 1")
        if not (0 < shift_factor < 1):
            raise ValueError("shift_factor must be between 0 and 1")
        bp = build_params or BuildParams()
        points = np.asarray(points)
        pts_sorted, self._labels_sorted, self._decoding = sort_by_labels(
            points, np.asarray(filter_values)
        )
        self._ps = make_pointset(pts_sorted, metric)
        self._bp = bp
        self._cutoff = int(cutoff)
        self._split = float(split_factor)
        self._shift = float(shift_factor)
        n = self._ps.n
        self._rows = super_row_layout(n, self._cutoff, self._split, self._shift)
        self._mesh = None
        self._graphs: List[SlabGraph] = []
        # One shared slab shape for rows >= 1 (row 0 keeps the whole-dataset
        # shape so it shares the flat graph's cache and compiled kernels):
        # every overlapping row's slab is ~n/shift_factor but each differs
        # slightly, and each distinct slab size costs fresh 20-40s XLA
        # compiles for every build-step and query-beam shape — padding all
        # rows to one size compiles once (round-1 verdict item 8).
        from .base import cache_fingerprint
        from .vamana import max_step_insert

        self._fp = cache_fingerprint(self._labels_sorted, pts_sorted)
        layouts = [self._row_slab(n, bs, sh, nb)
                   for (bs, sh, nb) in self._rows]
        pad_rows = insert_pad = 0
        if len(layouts) > 1:
            pad_rows = -(-max(int(o[-1]) for o, _ in layouts[1:]) // 4096) * 4096
            insert_pad = max(max_step_insert(o) for o, _ in layouts[1:])
        for r, (slab_offsets, s2g) in enumerate(layouts):
            self._graphs.append(self._load_or_build_row(
                r, slab_offsets, s2g, seed,
                pad_rows=0 if r == 0 else pad_rows,
                insert_pad=0 if r == 0 else insert_pad))
        from .base import RowResidency

        self._res = RowResidency(self._graphs, device_rows_budget)

    @staticmethod
    def _row_slab(n, bsize, bshift, nb):
        """Contiguous slab layout: bucket b spans global [b*shift, b*shift+size)."""
        if nb == 1:
            return np.array([0, n], dtype=np.int64), np.arange(n, dtype=np.int64)
        starts = np.arange(nb, dtype=np.int64) * bshift
        lens = np.minimum(starts + bsize, n) - starts
        offsets = np.concatenate([[0], np.cumsum(lens)])
        s2g = np.concatenate(
            [start + np.arange(ln, dtype=np.int64) for start, ln in zip(starts, lens)]
        )
        return offsets, s2g

    def _row_cache_file(self, r: int) -> Optional[str]:
        bp = self._bp
        if not bp.cache_path:
            return None
        lo, hi = float(self._labels_sorted[0]), float(self._labels_sorted[-1])
        return super_row_cache_filename(
            bp.cache_path, bp, lo, hi, self._ps.n, self._split, self._shift,
            self._cutoff, r,
        )

    def _load_or_build_row(self, r, slab_offsets, s2g, seed, pad_rows=0,
                           insert_pad=0) -> SlabGraph:
        from .base import whole_dataset_cache

        fname = self._row_cache_file(r)
        load_from = fname
        canon = None
        if r == 0 and self._bp.cache_path:
            # row 0 = one whole-dataset bucket: share the flat graph cache
            canon = whole_dataset_cache(
                self._bp.cache_path, self._bp,
                float(self._labels_sorted[0]), float(self._labels_sorted[-1]),
                self._ps.n)
            if (fname and not os.path.exists(fname)
                    and os.path.exists(canon)):
                load_from = canon
        m_real = int(slab_offsets[-1])
        m_pad = max(m_real, pad_rows)
        nbrs = None
        if load_from and os.path.exists(load_from):
            from .base import load_cached_nbrs

            nbrs = load_cached_nbrs(load_from, self._fp)
        if nbrs is not None:
            # caches store the REAL rows (padding-agnostic); pad on load so
            # all rows share one device shape
            if nbrs.shape[0] < m_pad:
                nbrs = np.concatenate([
                    nbrs, np.full((m_pad - nbrs.shape[0], nbrs.shape[1]), -1,
                                  dtype=nbrs.dtype)])
            if len(s2g) < m_pad:
                s2g = np.concatenate(
                    [s2g, np.full(m_pad - len(s2g), s2g[-1], dtype=s2g.dtype)])
            return SlabGraph(
                nbrs_dev=jnp.asarray(nbrs),
                slab_to_global_dev=jnp.asarray(s2g.astype(np.int32)),
                nbrs_host=nbrs,
                degrees=(nbrs >= 0).sum(axis=1).astype(np.int32),
                bucket_slab_offsets=slab_offsets,
                slab_to_global_host=s2g,
                identity_s2g=bool(
                    m_pad == self._ps.n
                    and np.array_equal(s2g, np.arange(len(s2g)))),
            )
        if self._require_cache:
            raise FileNotFoundError(
                f"require_cache: super row {r} cache absent or fingerprint-"
                f"mismatched ({fname})")
        g = build_vamana_graph(self._ps, s2g, slab_offsets, self._bp,
                               seed=seed + r, pad_rows=pad_rows,
                               insert_pad=insert_pad)
        if fname:
            os.makedirs(os.path.dirname(fname), exist_ok=True)
            np.savez_compressed(fname, nbrs=g.nbrs_host[:m_real],
                                fingerprint=self._fp)
            if canon and not os.path.exists(canon):
                np.savez_compressed(canon, nbrs=g.nbrs_host[:m_real],
                                    fingerprint=self._fp)
        return g

    def shard(self, mesh) -> "SuperOptimizedPostfilterTree":
        """Query-shard over a device Mesh (index replicated)."""
        from ..parallel.sharded import replicate_index

        replicate_index(self._ps, self._graphs, mesh)
        self._mesh = mesh
        return self

    def _route(self, lo: int, hi: int) -> Tuple[int, int]:
        """Smallest row/bucket containing [lo, hi) (ref: :202-243).
        Scans rows smallest-bucket-first; row 0 is the fallback."""
        n = self._ps.n
        for r in range(len(self._rows) - 1, 0, -1):
            bsize, bshift, nb = self._rows[r]
            if bsize < hi - lo:
                continue
            first = min(lo // bshift, nb - 1)
            last = min((hi - 1) // bshift, nb - 1)
            for b in range(first, last + 1):
                b_lo = b * bshift
                b_hi = min(b_lo + bsize, n)
                if lo >= b_lo and hi <= b_hi:
                    return r, b
        return 0, 0

    def batch_search(
        self,
        queries: np.ndarray,
        filters: Sequence[Tuple[float, float]],
        num_queries: int,
        query_params: QueryParams = None,
        stats=None,  # optional utils.stats.QueryStats
    ) -> Tuple[np.ndarray, np.ndarray]:
        qp = query_params
        queries = np.asarray(queries, dtype=np.float32)[:num_queries]
        filters = np.asarray(filters, dtype=np.float64)[:num_queries]
        k = qp.k
        qpad = pad_queries(queries, self._ps.d, self._ps.d_pad)
        q_norms = np.einsum("qd,qd->q", queries, queries).astype(np.float32)
        lo_idx = first_geq(self._labels_sorted, filters[:, 0])
        hi_idx = first_geq(self._labels_sorted, filters[:, 1])
        hi_incl = np.searchsorted(self._labels_sorted, filters[:, 1], side="right")

        rows = np.full(num_queries, -1, dtype=np.int64)
        buckets = np.zeros(num_queries, dtype=np.int64)
        act = np.nonzero(hi_idx > lo_idx)[0]  # empty ranges stay routed to -1
        routed = native.route_super_batch(
            self._rows, self._ps.n,
            lo_idx[act].astype(np.int64), hi_idx[act].astype(np.int64),
        ) if len(act) else None
        if routed is not None:
            rows[act] = routed[0]
            buckets[act] = routed[1]
        else:  # Python fallback (parity-tested against the native router)
            for qi in act:
                rows[qi], buckets[qi] = self._route(int(lo_idx[qi]), int(hi_idx[qi]))

        out_i = np.full((num_queries, k), int(EMPTY_ID), dtype=np.int64)
        out_d = np.full((num_queries, k), np.inf, dtype=np.float32)
        from .base import _qkey, plan_row_inline

        # int8 inline blocks for this batch's busiest rows (quantized
        # scores exact-reranked inside doubling_postfilter)
        urows, ucounts = np.unique(rows[rows >= 0], return_counts=True)
        if len(urows) and self._mesh is None:
            if not hasattr(self, "_inline_attached"):
                self._inline_attached = set()
            plan_row_inline(self._ps, self._graphs, {},
                            self._inline_attached, urows, ucounts)

        q_key = _qkey(qpad)  # hash once; reused by every per-row call
        for r in np.unique(rows[rows >= 0]):
            sel = np.nonzero(rows == r)[0]
            g = self._res.touch(r)
            starts = g.bucket_slab_offsets[buckets[sel]].astype(np.int32)
            ids, dists = doubling_postfilter(
                self._ps, g, qpad, q_norms[sel], starts,
                lo_idx[sel].astype(np.int64), hi_incl[sel].astype(np.int64),
                qp, self._ps.metric, stats=stats, stat_ids=sel,
                mesh=self._mesh, q_rows=sel, q_key=q_key,
            )
            out_i[sel], out_d[sel] = ids, dists

        return finalize_output(
            out_d, out_i, self._decoding, q_norms, self._ps.metric, pad_id=0
        )

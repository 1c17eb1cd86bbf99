"""PrefilterIndex — exact brute-force window search.

TPU-native equivalent of the reference's PrefilterIndex
(ref: src/prefiltering.h:29-205): argsort points by label, binary-search the
query range endpoints, compute exact distances to every in-range point, keep
the k nearest. On TPU the scan is batched across queries and runs as MXU
matmul tiles (see ops/bruteforce.py) instead of a per-query fork-join loop.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..params import BuildParams, QueryParams
from ..utils.data import first_geq, make_pointset, pad_queries, sort_by_labels
from .base import batched_range_bruteforce, finalize_output


class PrefilterIndex:
    """Exact range-filtered k-NN by brute force over the label window."""

    def __init__(
        self,
        points: np.ndarray,
        filter_values: np.ndarray,
        build_params: Optional[BuildParams] = None,  # unused; kept for API parity
        metric: str = "Euclidian",
    ):
        del build_params  # unused, like the reference (prefiltering.h:46-47)
        points = np.asarray(points)
        pts_sorted, self._labels_sorted, self._decoding = sort_by_labels(
            points, np.asarray(filter_values)
        )
        self._ps = make_pointset(pts_sorted, metric)

    @property
    def metric(self) -> str:
        return self._ps.metric

    def batch_search(
        self,
        queries: np.ndarray,
        filters: Sequence[Tuple[float, float]],
        num_queries: int,
        query_params: QueryParams,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (ids [nq, k] uint32 original ids, dists [nq, k] f32).

        Filter bounds follow the reference's arithmetic: points with
        label in [first >= lo, first >= hi) are candidates
        (ref: prefiltering.h:157-184).
        """
        queries = np.asarray(queries, dtype=np.float32)[:num_queries]
        filters = np.asarray(filters, dtype=np.float64)[:num_queries]
        k = query_params.k
        qp = pad_queries(queries, self._ps.d, self._ps.d_pad)
        starts = first_geq(self._labels_sorted, filters[:, 0])
        ends = first_geq(self._labels_sorted, filters[:, 1])
        dists, ids = batched_range_bruteforce(
            self._ps.data, self._ps.norms_sq, qp, starts, ends, k, self._ps.metric,
            norm_col=self._ps.norm_col,
        )
        q_norms = np.einsum("qd,qd->q", queries, queries)
        return finalize_output(
            dists, ids, self._decoding, q_norms, self._ps.metric, pad_id=-1
        )

    def batch_search_many(
        self,
        batches: Sequence[Tuple[np.ndarray, Sequence[Tuple[float, float]]]],
        query_params: QueryParams,
    ) -> "list[Tuple[np.ndarray, np.ndarray]]":
        """Pipelined search over a stream of (queries, filters) batches.

        Launches every batch's kernels before fetching any result, so batch
        N+1's query upload rides behind batch N's compute and the whole
        stream pays ONE blocking fetch round trip. On the remote-tunnel
        deployment this is the throughput mode: per-batch upload (~50 ms)
        and fetch (~40 ms) costs that serialize in repeated batch_search
        calls overlap here (see CLAUDE.md "Tunnel economics").
        Returns [(ids, dists)] in batch order, same per-batch contract as
        batch_search.
        """
        from .base import finish_many_range_bruteforce, launch_range_bruteforce

        k = query_params.k
        kept_queries = []
        launches = []
        for queries, filters in batches:
            queries = np.asarray(queries, dtype=np.float32)
            filters = np.asarray(filters, dtype=np.float64)
            qp = pad_queries(queries, self._ps.d, self._ps.d_pad)
            starts = first_geq(self._labels_sorted, filters[:, 0])
            ends = first_geq(self._labels_sorted, filters[:, 1])
            kept_queries.append(queries)
            launches.append(launch_range_bruteforce(
                self._ps.data, self._ps.norms_sq, qp, starts, ends, k,
                self._ps.metric, norm_col=self._ps.norm_col))
        out = []
        for queries, (dists, ids) in zip(
                kept_queries, finish_many_range_bruteforce(launches)):
            q_norms = np.einsum("qd,qd->q", queries, queries)
            out.append(finalize_output(
                dists, ids, self._decoding, q_norms, self._ps.metric,
                pad_id=-1))
        return out

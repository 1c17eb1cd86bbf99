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

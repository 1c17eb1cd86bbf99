"""Per-query search statistics and graph statistics.

TPU-native equivalent of the reference's stats harness
(ref: ParlayANN/algorithms/utils/stats.h:43-88, graph_stats_ :90+). The
reference increments per-query counters inside the scalar search loop; here
the batched beam-search kernel *returns* the counters as device arrays
(ops/beam_search.py BeamResult.num_visited / .dist_cmps), and this module
accumulates and reports them host-side with the same avg + 99th-percentile
summary.
"""

from __future__ import annotations

import numpy as np


class QueryStats:
    """Accumulates visited-node and distance-comparison counts per query
    (ref: stats.h:53-88). A query may contribute from several batched kernel
    launches (e.g. the doubling loop or multi-bucket tree queries); counts
    accumulate by query id."""

    def __init__(self, n: int):
        self.visited = np.zeros(n, dtype=np.int64)
        self.distances = np.zeros(n, dtype=np.int64)

    # -- increments (accept scalars or arrays of query ids) ------------------
    def increment_visited(self, i, cnt) -> None:
        np.add.at(self.visited, i, cnt)

    def increment_dist(self, i, cnt) -> None:
        np.add.at(self.distances, i, cnt)

    def add_beam_result(self, query_ids, result) -> None:
        """Fold a BeamResult's counters into the per-query totals."""
        self.increment_visited(query_ids, np.asarray(result.num_visited)[: len(query_ids)])
        self.increment_dist(query_ids, np.asarray(result.dist_cmps)[: len(query_ids)])

    # -- reporting (avg + 99th percentile, ref: stats.h:63-88) ---------------
    @staticmethod
    def _two_stats(arr: np.ndarray):
        if len(arr) == 0:
            return 0.0, 0.0
        s = np.sort(arr)
        tail = s[int(len(s) * 0.99) :]
        return float(s.mean()), float(tail.mean()) if len(tail) else 0.0

    def visited_stats(self):
        return self._two_stats(self.visited)

    def dist_stats(self):
        return self._two_stats(self.distances)

    def print(self) -> None:
        va, v99 = self.visited_stats()
        da, d99 = self.dist_stats()
        print(f"Visited: average {va}, 99th percentile {v99}")
        print(f"Distance comparisons: average {da}, 99th percentile {d99}")

    def clear(self) -> None:
        self.visited[:] = 0
        self.distances[:] = 0


def graph_stats(nbrs_host: np.ndarray):
    """(avg_degree, max_degree) of a padded [m, R] adjacency
    (ref: stats.h graph_stats_)."""
    degs = (np.asarray(nbrs_host) >= 0).sum(axis=1)
    return float(degs.mean()), int(degs.max(initial=0))

"""Unfiltered Vamana index (file-based API parity with the reference).

Equivalent of the reference's VamanaIndex / build_vamana_index
(ref: ParlayANN/python/vamana_index.cpp:43-125, builder.cpp:33-59,
python_bindings.cpp:93-109): build an index from a binary vector file and save
the graph; load and batch-search with beam width; recall check against a
binary ground-truth file.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.beam_search import batched_beam_search, default_expand
from ..ops.topk import EMPTY_ID
from ..params import BuildParams
from ..utils import io as bin_io
from ..utils.data import canonical_metric, make_pointset, pad_queries
from .base import finalize_output, next_pow2
from .vamana import SlabGraph, build_vamana_graph


def build_vamana_index(
    distance_metric: str,
    data_file_path: str,
    index_output_path: str,
    graph_degree: int,
    beam_width: int,
    alpha: float,
    dtype: str = "float",
    seed: int = 0,
) -> None:
    """Build from a .bin vector file, save graph (ref: builder.cpp:33-59)."""
    data = bin_io.read_vector_file(data_file_path, dtype)
    ps = make_pointset(data, distance_metric)
    n = ps.n
    bp = BuildParams(R=graph_degree, L=beam_width, alpha=alpha)
    g = build_vamana_graph(
        ps, np.arange(n, dtype=np.int64), np.array([0, n]), bp, seed=seed
    )
    bin_io.write_graph_file(index_output_path, g.nbrs_host)


class VamanaIndex:
    """Load a built graph + vectors; batch-search (ref: vamana_index.cpp:43)."""

    def __init__(
        self,
        index_path: str,
        data_path: str,
        num_points: int = 0,
        dimensions: int = 0,
        metric: str = "Euclidian",
        dtype: str = "float",
    ):
        data = bin_io.read_vector_file(data_path, dtype)
        if num_points:
            assert num_points == data.shape[0]
        if dimensions:
            assert dimensions == data.shape[1]
        nbrs, _ = bin_io.read_graph_file(index_path)
        self._init_from_arrays(data, nbrs, metric)

    @classmethod
    def from_arrays(cls, data: np.ndarray, nbrs: np.ndarray, metric="Euclidian"):
        self = cls.__new__(cls)
        self._init_from_arrays(data, nbrs, metric)
        return self

    def _init_from_arrays(self, data, nbrs, metric):
        from .base import maybe_attach_inline

        self._ps = make_pointset(data, metric)
        n = self._ps.n
        s2g = np.arange(n, dtype=np.int64)
        self._graph = SlabGraph(
            nbrs_dev=jnp.asarray(nbrs),
            slab_to_global_dev=jnp.asarray(s2g.astype(np.int32)),
            nbrs_host=nbrs,
            degrees=(nbrs >= 0).sum(axis=1).astype(np.int32),
            bucket_slab_offsets=np.array([0, n]),
            slab_to_global_host=s2g,
            identity_s2g=True,
        )
        maybe_attach_inline(self._graph, self._ps)

    def batch_search(
        self,
        queries: np.ndarray,
        num_queries: int,
        knn: int,
        beam_width: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """QueryParams(knn, beam, cut=1.35, limit=n, degree_limit=maxDeg)
        (ref: vamana_index.cpp:57). Search always starts at vertex 0."""
        queries = np.asarray(queries, dtype=np.float32)[:num_queries]
        ps = self._ps
        qpad = pad_queries(queries, ps.d, ps.d_pad)
        q_norms = np.einsum("qd,qd->q", queries, queries)
        qpow = next_pow2(max(num_queries, 64))
        qs = np.zeros((qpow, ps.d_pad), dtype=np.float32)
        qn = np.zeros((qpow,), dtype=np.float32)
        act = np.zeros((qpow,), dtype=bool)
        qs[:num_queries], qn[:num_queries], act[:num_queries] = qpad, q_norms, True
        res = batched_beam_search(
            ps.data, ps.norms_sq, self._graph.nbrs_dev,
            self._graph.slab_to_global_dev,
            jnp.asarray(qs), jnp.zeros(qpow, jnp.int32),
            beam=int(beam_width), k=int(knn), cut=jnp.float32(1.35),
            limit=jnp.int32(ps.n), metric=ps.metric,
            active_in=jnp.asarray(act), q_norms_sq=jnp.asarray(qn),
            expand=default_expand(int(beam_width)),
            norm_col=ps.norm_col if ps.norm_col >= 0 else None,
            identity_map=True,
            nbr_vecs=self._graph.nbr_vecs,
            nbr_norms=self._graph.nbr_norms,
            nbr_scale=self._graph.nbr_scale,
        )
        f_ids, f_d = res.frontier_ids, res.frontier_dists
        if self._graph.nbr_scale is not None:
            # quantized inline: frontier scores carry int8 rounding —
            # exact-rerank the top-(k+slack) in fp32 (identity slab map:
            # frontier slab ids ARE global rows)
            from ..ops.beam_search import exact_rerank

            f_ids, f_d = exact_rerank(
                ps.data, ps.norms_sq, jnp.asarray(qs),
                f_ids[:, : int(knn) + 8], int(knn), ps.metric,
                norm_col=ps.norm_col if ps.norm_col >= 0 else None)
        ids, dists = jax.device_get((f_ids, f_d))
        ids = ids[:num_queries, :knn].astype(np.int64)
        dists = dists[:num_queries, :knn]
        return finalize_output(dists, ids, None, q_norms, ps.metric, pad_id=0)

    def check_recall(self, gFile: str, neighbors: np.ndarray, k: int) -> float:
        """Recall vs a binary GT file with distance-tie handling
        (ref: vamana_index.cpp:99-125, check_nn_recall.h:85-108)."""
        gt_ids, gt_dists = bin_io.read_groundtruth_file(gFile)
        n = neighbors.shape[0]
        hits = 0
        for i in range(n):
            # include all GT entries tied with the k-th distance
            kth = gt_dists[i, k - 1]
            valid = set(gt_ids[i, np.nonzero(gt_dists[i] <= kth)[0]].tolist())
            hits += len(valid & set(neighbors[i, :k].astype(np.uint32).tolist()))
        return hits / (n * k)

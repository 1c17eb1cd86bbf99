"""Point storage for TPU window search.

TPU-native replacement for the reference's PointRange / SubsetPointRange
(ref: ParlayANN/algorithms/utils/point_range.h:50,136) and the label-sorting
ingest path (ref: src/tree_utils.h:40-98).

Design: instead of 64-byte-aligned pointer views over malloc'd memory, points
live in one padded `[n, d_pad]` device array in HBM (d padded to a multiple of
128 so distance matmuls tile cleanly onto the MXU). Squared norms are
precomputed for the `||q - x||^2 = ||x||^2 - 2 q.x (+ const)` L2 formulation.
Subsets are *integer windows / index arrays* into this single array — tree
buckets are contiguous slices because points are stored label-sorted.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128  # TPU lane width; last dim padded to a multiple of this.

# metric names follow the reference's strings ("Euclidian" misspelling kept
# at the API layer; internally we use canonical short names).
METRIC_L2 = "l2"
METRIC_MIPS = "mips"

# Stores are row-padded to this multiple so every Pallas scan tile size
# (ops/pallas_scan.grid_params: 2048 or 4096) divides them exactly — see
# make_pointset. Must stay a multiple of the largest tile.
SCAN_ROW_PAD = 4096
_METRIC_ALIASES = {
    "euclidian": METRIC_L2,
    "euclidean": METRIC_L2,
    "l2": METRIC_L2,
    "mips": METRIC_MIPS,
    "ip": METRIC_MIPS,
    "angular": METRIC_MIPS,  # angular data is pre-normalized and searched with MIPS
}


def canonical_metric(metric: str) -> str:
    m = _METRIC_ALIASES.get(metric.lower())
    if m is None:
        raise ValueError(f"Unknown metric {metric!r}; expected one of {sorted(_METRIC_ALIASES)}")
    return m


def pad_dim(d: int, lane: int = LANE) -> int:
    return ((d + lane - 1) // lane) * lane


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PointSet:
    """A padded, device-resident point store.

    Attributes:
      data: [n, d_pad] float32 (or bfloat16) point matrix. Rows beyond `d` are
        zero so dot products over the padded dim are exact.
      norms_sq: [n] float32 squared L2 norms (only needed for the L2 metric,
        but cheap enough to always carry).
      n: number of points (static).
      d: true dimensionality (static).
      metric: "l2" or "mips" (static).
    """

    data: jax.Array
    norms_sq: jax.Array
    n: int
    d: int
    metric: str
    # column of `data` holding ||x||^2 (queries are zero there, so distance
    # matmuls are unaffected and one row gather yields vector AND norm —
    # element-gathers of a separate norm array are row-rate-bound on TPU)
    norm_col: int = -1

    # --- pytree plumbing (n/d/metric are static aux data) ---
    def tree_flatten(self):
        return (self.data, self.norms_sq), (self.n, self.d, self.metric,
                                            self.norm_col)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, norms_sq = children
        n, d, metric, norm_col = aux
        return cls(data=data, norms_sq=norms_sq, n=n, d=d, metric=metric,
                   norm_col=norm_col)

    @property
    def d_pad(self) -> int:
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.dtype


def make_pointset(
    points: np.ndarray,
    metric: str,
    compute_dtype: jnp.dtype = jnp.float32,
) -> PointSet:
    """Pad + upload a host point matrix.

    Integer dtypes (uint8/int8, the reference's Uint8/Int8 variants — ref:
    euclidian_point.h:68-112 stores bytes and computes integer distances)
    keep NATIVE int8/uint8 storage: 1 byte per dim in HBM (4x less than the
    round-1 fp32 widening — the route to 12M-point stores on one chip) with
    distances still exact — integer values are exactly representable in
    bfloat16, so distance matmuls run as single bf16 MXU passes with exact
    fp32 accumulation (see ops/distances.mxu_operands). Integer stores carry
    no fused ||x||^2 column (norms exceed the byte range); norms_sq serves
    instead, in fp32 (exact to 2^24 — d <= 256 worst case; 512-dim uint8
    can round the last ~2 ulp of a 3.3e7 norm).
    """
    metric = canonical_metric(metric)
    if points.ndim != 2:
        raise ValueError("points array must be 2-dimensional")
    n, d = points.shape
    # Row-pad the store to a SCAN_ROW_PAD multiple so the Pallas scan's tiles
    # divide it exactly — otherwise every scan launch re-pads the whole store
    # on device (a full-HBM copy + transient 2x footprint at 10M+ points).
    # Pad rows are all-zero with norm 0; every consumer masks by window ends
    # (<= n) or candidate validity, never by gathered distance, so they are
    # unreachable. PointSet.n stays the REAL count.
    n_rows = -(-n // SCAN_ROW_PAD) * SCAN_ROW_PAD
    if points.dtype in (np.int8, np.uint8):
        return _make_int_pointset(points, metric, n, d, n_rows)
    dp = pad_dim(d + 1)  # + 1 slot for the fused ||x||^2 column (float path)
    norm_col = d
    if n_rows * dp * 4 > _STREAM_INGEST_BYTES:
        return _make_float_pointset_streaming(
            points, metric, n, d, n_rows, dp, norm_col, compute_dtype)
    host = np.zeros((n_rows, dp), dtype=np.float32)
    host[:n, :d] = points.astype(np.float32)
    norms = np.einsum("nd,nd->n", host, host).astype(np.float32)
    host[:, norm_col] = norms
    data = jnp.asarray(host, dtype=compute_dtype)
    return PointSet(data=data, norms_sq=jnp.asarray(norms), n=n, d=d,
                    metric=metric, norm_col=norm_col)


# Float stores above this size stream to the device in chunks: a single
# multi-GB device_put reproducibly HANGS the axon tunnel (two 10M-point
# ingests stalled with zero progress for 35+ min in round 3; the round-2
# 12M uint8 ingest hit the same wall and was fixed the same way).
_STREAM_INGEST_BYTES = int(1.5e9)


def _make_float_pointset_streaming(points, metric, n, d, n_rows, dp,
                                   norm_col, compute_dtype) -> PointSet:
    """Chunked float ingest, bit-identical to the host-padded single-put
    path: each chunk is padded + norm-columned on the HOST with the same
    np.einsum, so only the transfer schedule differs. The device buffer is
    a donated loop carry (in-place dynamic_update_slice)."""
    data = jnp.zeros((n_rows, dp), dtype=compute_dtype)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _putf(buf, chunk, lo):
        return jax.lax.dynamic_update_slice(
            buf, chunk.astype(compute_dtype), (lo, 0))

    norms = np.zeros(n_rows, dtype=np.float32)
    step = max(1, _STREAM_INGEST_BYTES // 8 // (dp * 4))
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        chunk = np.zeros((hi - lo, dp), dtype=np.float32)
        chunk[:, :d] = points[lo:hi].astype(np.float32)
        nrm = np.einsum("nd,nd->n", chunk, chunk).astype(np.float32)
        chunk[:, norm_col] = nrm
        norms[lo:hi] = nrm
        data = _putf(data, jnp.asarray(chunk), jnp.int32(lo))
    return PointSet(data=data, norms_sq=jnp.asarray(norms[:n_rows]),
                    n=n, d=d, metric=metric, norm_col=norm_col)


def _make_int_pointset(points, metric, n: int, d: int, n_rows: int) -> PointSet:
    """Streaming ingest for native int8/uint8 stores (ref variants
    euclidian_point.h:68-112): the store is assembled ON DEVICE in ~0.5 GB
    chunks with exact int32 square-sums per chunk, so the host never
    materializes a padded copy or any wide transient. (The previous host
    path wrote ~18 GB of fresh pages at 12M x 512 — ~30 min of kernel
    page-zeroing on a 1-core host; this path's host cost is the upload
    stream itself.) Norms: squares <= 255^2 and d <= 512-term sums fit
    int32 exactly; the final cast to float32 rounds identically to the old
    int64 host path."""
    dp = pad_dim(max(d, 1))
    dtype = jnp.int8 if points.dtype == np.int8 else jnp.uint8
    data = jnp.zeros((n_rows, dp), dtype=dtype)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _put(buf, chunk, lo):
        c32 = chunk.astype(jnp.int32)
        nrm = (c32 * c32).sum(axis=1).astype(jnp.float32)
        if chunk.shape[1] < dp:
            chunk = jnp.pad(chunk, ((0, 0), (0, dp - chunk.shape[1])))
        return jax.lax.dynamic_update_slice(buf, chunk, (lo, 0)), nrm

    norms = np.zeros(n_rows, dtype=np.float32)
    step = 1 << 19  # 512k rows: ~0.25 GB per upload at d=512
    nrm_futs = []  # (lo, len, device future): ONE blocking fetch at the end
    for lo in range(0, n, step):
        chunk = np.ascontiguousarray(points[lo : lo + step])
        data, nrm = _put(data, jnp.asarray(chunk), jnp.int32(lo))
        nrm_futs.append((lo, len(chunk), nrm))
    for (lo, ln, _), nrm in zip(
            nrm_futs, jax.device_get([f for _, _, f in nrm_futs])):
        norms[lo : lo + ln] = nrm[:ln]
    return PointSet(data=data, norms_sq=jnp.asarray(norms), n=n, d=d,
                    metric=metric, norm_col=-1)


def pad_queries(queries: np.ndarray, d: int, d_padded: int) -> np.ndarray:
    if queries.ndim != 2 or queries.shape[1] != d:
        raise ValueError(f"queries must be [nq, {d}], got {queries.shape}")
    nq = queries.shape[0]
    out = np.zeros((nq, d_padded), dtype=np.float32)
    out[:, :d] = queries.astype(np.float32)
    return out


def sort_by_labels(
    points: np.ndarray, labels: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Label-argsort ingest (ref: src/tree_utils.h:40-98).

    Returns (points_sorted, labels_sorted, decoding) where
    decoding[sorted_id] = original point id.
    Labels are kept in float64 on the host so timestamp-scale values
    (e.g. RedCaps Unix times) binary-search exactly.
    """
    labels = np.asarray(labels)
    if labels.ndim != 1:
        raise ValueError("filter (label) array must be 1-dimensional")
    if labels.shape[0] != points.shape[0]:
        raise ValueError(
            "filter (label) array must have the same number of elements as the points array"
        )
    # fast path: already label-sorted input (common for generated / re-saved
    # protocol datasets). A stable argsort of a sorted array is the identity
    # even with ties, so the 2x-store permutation gather — minutes of host
    # page-zeroing at 10M+ points on a weak host — is pure waste; return the
    # caller's array un-copied (every consumer treats it as read-only).
    if len(labels) and bool((labels[:-1] <= labels[1:]).all()):
        order = np.arange(len(labels), dtype=np.int64)
        return points, labels.astype(np.float64), order
    order = np.argsort(labels, kind="stable")
    return points[order], labels[order].astype(np.float64), order.astype(np.int64)


def first_geq(labels_sorted: np.ndarray, values) -> np.ndarray:
    """Index of the first label >= value (ref: src/tree_utils.h:20-37).

    Vectorized over `values`. Equals len(labels_sorted) when value exceeds all.
    """
    return np.searchsorted(labels_sorted, values, side="left")


def label_range_to_window(
    labels_sorted: np.ndarray, lo, hi
) -> Tuple[np.ndarray, np.ndarray]:
    """Map inclusive label ranges [lo, hi] to sorted-index windows.

    Follows the reference's convention: inclusive_start = first index with
    label >= lo; exclusive_end = first index with label >= hi
    (ref: src/range_filter_tree.h:306-309). Note the reference's quirk that the
    point whose label == hi is *excluded* by this arithmetic unless it is
    matched by `first_geq`; we reproduce it exactly for parity.
    """
    return first_geq(labels_sorted, lo), first_geq(labels_sorted, hi)

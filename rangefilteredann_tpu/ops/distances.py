"""Distance computation blocks.

TPU-native replacement for the reference's SIMD distance functors
(ref: ParlayANN/algorithms/utils/euclidian_point.h:67-112,
 mips_point.h:68-113, NSGDist.h). All distances are formulated as matmuls so
they run on the MXU:

  L2^2(q, x) = ||x||^2 - 2 q.x  (+ ||q||^2, a per-query constant dropped
               everywhere, exactly as ordering-only distances allow)
  MIPS(q, x) = -q.x             (negated inner product, ref: mips_point.h:82)

`is_metric` gating: cut-pruning in beam search only applies to L2
(ref: mips_point.h:72 -> beamSearch.h:162).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.data import METRIC_L2, METRIC_MIPS

# Matmul precision for float32 distance blocks. TPU (and some CPU backends)
# default fp32 matmuls to bf16 passes, which costs ~1e-1 absolute error on
# O(10) distances — enough to reorder true neighbors. HIGHEST keeps fp32
# ordering exact; for speed-over-exactness runs, store points as bfloat16
# (make_pointset(compute_dtype=jnp.bfloat16)) instead of degrading fp32.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def is_metric(metric: str) -> bool:
    return metric == METRIC_L2


_INT_DTYPES = (jnp.int8, jnp.uint8)


def mxu_operands(block: jax.Array, other: jax.Array):
    """(block', other', precision) for an MXU distance dot.

    Integer-stored blocks (native int8/uint8 storage, the reference's
    Int8/Uint8 variants — ref: euclidian_point.h:68-112 computes integer
    distances) cast to bfloat16: int8/uint8 values are EXACTLY representable
    in bf16, their products (< 2^16) are exact in the MXU's fp32 accumulator,
    and sums stay exact up to 2^24 (d <= 256 worst-case; 512-dim uint8 can
    round the last ~2 ulp of a 3.3e7 distance — ordering noise far below the
    integer grid). One MXU pass instead of fp32-HIGHEST's six, at 1/4 the
    HBM traffic. Float blocks keep fp32 + HIGHEST (exact ordering)."""
    if block.dtype in _INT_DTYPES:
        return (block.astype(jnp.bfloat16), other.astype(jnp.bfloat16),
                jax.lax.Precision.DEFAULT)
    if block.dtype == jnp.bfloat16:  # bf16 storage = explicit speed mode
        return block, other.astype(jnp.bfloat16), jax.lax.Precision.DEFAULT
    return block.astype(other.dtype), other, MATMUL_PRECISION


def query_block_distances(
    queries: jax.Array,  # [Q, d_pad] f32
    block: jax.Array,  # [T, d_pad] points tile
    block_norms: jax.Array,  # [T] f32
    metric: str,
) -> jax.Array:
    """All-pairs distances between a query block and a point tile: [Q, T].

    One big MXU matmul — the workhorse of brute-force / prefilter scans.
    """
    blk, q, prec = mxu_operands(block, queries)
    ip = jnp.dot(
        q, blk.T, preferred_element_type=jnp.float32, precision=prec,
    )
    if metric == METRIC_L2:
        return block_norms[None, :] - 2.0 * ip
    elif metric == METRIC_MIPS:
        return -ip
    raise ValueError(metric)


def gathered_distances(
    queries: jax.Array,  # [Q, d_pad]
    gathered: jax.Array,  # [Q, C, d_pad] per-query candidate vectors
    gathered_norms: jax.Array,  # [Q, C]
    metric: str,
) -> jax.Array:
    """Per-query distances to per-query gathered candidates: [Q, C].

    A batched matvec (batch dim Q, contraction d). Bandwidth-bound by the
    gather; the contraction itself rides the MXU via dot_general.
    """
    g, q, prec = mxu_operands(gathered, queries)
    ip = jax.lax.dot_general(
        g,
        q[..., None],  # [Q, d, 1]
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )[..., 0]
    if metric == METRIC_L2:
        return gathered_norms - 2.0 * ip
    elif metric == METRIC_MIPS:
        return -ip
    raise ValueError(metric)


def fused_norm_distances(
    vecs: jax.Array,  # [Q, C, d_pad] gathered rows carrying ||x||^2 at norm_col
    queries: jax.Array,  # [Q, d_pad] zero-padded queries
    metric: str,
    norm_col: int,
) -> jax.Array:
    """Distances with the norm consumed INSIDE the matmul: the query's entry
    at norm_col is set to -0.5 (L2) / 0 (MIPS), so shifted-L2 = -2*ip and
    MIPS = -ip with no separate norm read (element-gathers are row-rate-bound
    on TPU). Returns [Q, C] shifted distances."""
    queries = queries.at[:, norm_col].set(
        -0.5 if metric == METRIC_L2 else 0.0
    )
    ip = jax.lax.dot_general(
        vecs,
        queries[..., None].astype(vecs.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=MATMUL_PRECISION,
    )[..., 0]
    return -2.0 * ip if metric == METRIC_L2 else -ip


def gather_and_distance(
    data: jax.Array,  # [n, d_pad] point store
    norms_sq: jax.Array,  # [n]
    ids: jax.Array,  # [...] int32 global point ids (clipped by caller)
    queries: jax.Array,  # [Q, d_pad] where ids.shape[0] == Q
    metric: str,
) -> jax.Array:
    """Gather rows `ids` per query and return distances, shape == ids.shape."""
    safe = jnp.clip(ids, 0, data.shape[0] - 1)
    vecs = data[safe]  # [Q, C, d_pad]
    nrm = norms_sq[safe]
    return gathered_distances(queries, vecs, nrm, metric)


@functools.partial(jax.jit, static_argnames=("metric",))
def pairwise_distances(
    a: jax.Array, a_norms: jax.Array, b: jax.Array, b_norms: jax.Array, metric: str
) -> jax.Array:
    """[A, B] all-pairs distances between two padded point blocks."""
    b_c, a_c, prec = mxu_operands(b, a)
    ip = jnp.dot(a_c, b_c.T, preferred_element_type=jnp.float32,
                 precision=prec)
    if metric == METRIC_L2:
        return a_norms[:, None] + b_norms[None, :] - 2.0 * ip
    elif metric == METRIC_MIPS:
        return -ip
    raise ValueError(metric)

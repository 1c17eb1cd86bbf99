"""Range-masked brute-force k-NN scans.

TPU-native replacement for the reference's exact prefiltering scan
(ref: src/prefiltering.h:154-204) and the B-WST fringe brute force
(ref: src/range_filter_tree.h:386-397).

Two strategies, both exact:

  * `windowed_bruteforce` — each query scans its own [start, end) window of the
    label-sorted point array, gathered as a padded per-query block. Right for
    small windows (tree fringes, tiny filter fractions).
  * `scan_bruteforce` — all queries scan the full array in MXU-sized tiles of a
    single big matmul, masking columns outside each query's window, keeping a
    running top-k. Right for large windows (filter fraction near 1), where it
    turns the problem into pure [Q, d] x [d, n] matmul throughput.

Both return distances in the internal "shifted" form for L2 (missing the
per-query ||q||^2 constant — see ops/distances.py); callers add it back at the
API boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distances import (
    fused_norm_distances,
    gathered_distances,
    query_block_distances,
)
from .topk import EMPTY_ID, masked_topk, merge_topk


@functools.partial(
    jax.jit, static_argnames=("window", "k", "metric", "norm_col")
)
def windowed_bruteforce(
    data: jax.Array,  # [n, d_pad]
    norms_sq: jax.Array,  # [n]
    queries: jax.Array,  # [Q, d_pad]
    starts: jax.Array,  # [Q] int32 inclusive window starts (sorted ids)
    ends: jax.Array,  # [Q] int32 exclusive window ends
    window: int,  # static padded window size (>= max(ends-starts))
    k: int,
    metric: str,
    norm_col=None,  # fused ||x||^2 column (PointSet.norm_col): consumes the
    # norm inside the matmul (query entry = -0.5) and skips the per-row
    # norms_sq gather, which costs as much as the vector gather on TPU
):
    """Per-query window scan. Returns (dists [Q, k], ids [Q, k]) global ids.

    Empty slots have id EMPTY_ID and dist +inf.
    """
    n = data.shape[0]
    q = queries.shape[0]
    offs = jax.lax.broadcasted_iota(jnp.int32, (q, window), 1)
    ids = starts[:, None] + offs  # [Q, W]
    valid = ids < ends[:, None]
    safe = jnp.clip(ids, 0, n - 1)
    vecs = data[safe]  # [Q, W, d_pad]
    if norm_col is not None:
        dists = fused_norm_distances(vecs, queries, metric, norm_col)
    else:
        nrm = norms_sq[safe]
        dists = gathered_distances(queries, vecs, nrm, metric)
    dists = jnp.where(valid, dists, jnp.inf)
    ids = jnp.where(valid, ids, EMPTY_ID)
    return masked_topk(dists, ids, k)


@functools.partial(jax.jit, static_argnames=("k", "metric", "tile"))
def scan_bruteforce(
    data: jax.Array,  # [n, d_pad]
    norms_sq: jax.Array,  # [n]
    queries: jax.Array,  # [Q, d_pad]
    starts: jax.Array,  # [Q] int32
    ends: jax.Array,  # [Q] int32
    k: int,
    metric: str,
    tile: int = 8192,
):
    """Full-array tiled scan with per-query range masks.

    Returns (dists [Q, k], ids [Q, k]). The whole scan is Q x n MXU work:
    each tile is one [Q, d] x [d, T] matmul plus a top-k merge.
    """
    n, _ = data.shape
    q = queries.shape[0]
    n_tiles = -(-n // tile)

    # Pre-pad the point array to a whole number of tiles.
    pad = n_tiles * tile - n
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        norms_sq = jnp.pad(norms_sq, (0, pad))

    init_d = jnp.full((q, k), jnp.inf, dtype=jnp.float32)
    init_i = jnp.full((q, k), EMPTY_ID, dtype=jnp.int32)

    def body(t, carry):
        best_d, best_i = carry
        base = t * tile
        block = jax.lax.dynamic_slice_in_dim(data, base, tile, axis=0)
        bnorms = jax.lax.dynamic_slice_in_dim(norms_sq, base, tile, axis=0)
        dists = query_block_distances(queries, block, bnorms, metric)  # [Q, T]
        col = base + jax.lax.broadcasted_iota(jnp.int32, (q, tile), 1)
        valid = (col >= starts[:, None]) & (col < ends[:, None]) & (col < n)
        dists = jnp.where(valid, dists, jnp.inf)
        ids = jnp.where(valid, col, EMPTY_ID)
        td, ti = masked_topk(dists, ids, k)
        return merge_topk(best_d, best_i, td, ti, k)

    return jax.lax.fori_loop(0, n_tiles, body, (init_d, init_i))

"""Pallas TPU kernel: fused range-masked brute-force top-k scan.

The hot op of exact prefiltering (ref: src/prefiltering.h:154-204) as ONE
kernel: for each point tile, an MXU [Q, d] x [d, T] distance block, the
per-query label-window column mask, and a running in-VMEM top-k — no [Q, n]
distance matrix ever reaches HBM and no XLA sort/top_k launch happens per
tile. The XLA fallback (ops/bruteforce.scan_bruteforce) materializes [Q, T]
distances per tile and runs lax.top_k twice per tile; this kernel replaces
both with k argmin-extraction rounds on the VPU while the next tile's DMA is
in flight.

Exactness: identical results to the XLA path (same distance formulation, same
(dist, id) tie order) — pytest-enforced in tests/test_pallas.py via
interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.data import METRIC_L2, METRIC_MIPS
# plain Python int: jnp constants would be captured as tracer consts
# inside the pallas kernel, which pallas_call rejects
EMPTY_ID = 2**31 - 1

TILE = 512  # points per grid step; [Q=2048, TILE] f32 dists = 4 MB of VMEM


def _extract_topk(dists, ids, k):
    """k rounds of (argmin, mask): returns ([Q, k] dists, [Q, k] ids) sorted
    ascending by (dist, id). Ties resolve to the lowest id because column
    order is id order and argmin takes the first minimum."""
    q, t = dists.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (q, t), 1)
    out_d, out_i = [], []
    for _ in range(k):
        arg = jnp.argmin(dists, axis=1)  # first min -> lowest id on ties
        sel = col == arg[:, None]
        out_d.append(jnp.min(dists, axis=1))
        out_i.append(jnp.where(sel, ids, EMPTY_ID).min(axis=1))
        # blank both dist AND id of the taken element, so exhausted rounds
        # (all-inf rows) emit EMPTY_ID rather than a stale already-taken id
        dists = jnp.where(sel, jnp.inf, dists)
        ids = jnp.where(sel, EMPTY_ID, ids)
    return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1)


def _scan_kernel(starts_ref, ends_ref, q_ref, data_ref, norms_ref,
                 out_d_ref, out_i_ref, *, k, metric, n_real):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_d_ref[:] = jnp.full(out_d_ref.shape, jnp.inf, out_d_ref.dtype)
        out_i_ref[:] = jnp.full(out_i_ref.shape, EMPTY_ID, out_i_ref.dtype)

    ip = jnp.dot(
        q_ref[:], data_ref[:].T, preferred_element_type=jnp.float32
    )  # [Q, T] MXU block
    if metric == METRIC_L2:
        dist = norms_ref[:] - 2.0 * ip
    else:  # MIPS
        dist = -ip
    q = dist.shape[0]
    col = t * TILE + jax.lax.broadcasted_iota(jnp.int32, (q, TILE), 1)
    valid = (
        (col >= starts_ref[:])
        & (col < ends_ref[:])
        & (col < n_real)
    )
    dist = jnp.where(valid, dist, jnp.inf)
    ids = jnp.where(valid, col, EMPTY_ID)

    tile_d, tile_i = _extract_topk(dist, ids, k)
    comb_d = jnp.concatenate([out_d_ref[:], tile_d], axis=1)
    comb_i = jnp.concatenate([out_i_ref[:], tile_i], axis=1)
    best_d, best_i = _extract_topk(comb_d, comb_i, k)
    out_d_ref[:] = best_d
    out_i_ref[:] = best_i


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "interpret")
)
def pallas_scan_bruteforce(
    data: jax.Array,  # [n, d_pad]
    norms_sq: jax.Array,  # [n]
    queries: jax.Array,  # [Q, d_pad]
    starts: jax.Array,  # [Q] int32 inclusive window starts
    ends: jax.Array,  # [Q] int32 exclusive ends
    k: int,
    metric: str,
    interpret: bool = False,
):
    """Fused tiled scan. Returns (dists [Q, k], ids [Q, k] int32), L2 dists in
    the internal shifted form (see ops/distances.py). Same contract as
    ops/bruteforce.scan_bruteforce."""
    if metric not in (METRIC_L2, METRIC_MIPS):
        raise ValueError(metric)
    n, d_pad = data.shape
    q = queries.shape[0]
    n_tiles = -(-n // TILE)
    pad = n_tiles * TILE - n
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        norms_sq = jnp.pad(norms_sq, (0, pad))

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((q, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, d_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d_pad), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(
        _scan_kernel, k=k, metric=metric, n_real=n
    )
    out_d, out_i = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.float32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * q * (n_tiles * TILE) * d_pad,
            bytes_accessed=(n_tiles * TILE) * d_pad * 4 + q * d_pad * 4,
            transcendentals=0,
        ),
    )(
        starts.astype(jnp.int32)[:, None],
        ends.astype(jnp.int32)[:, None],
        queries,
        data,
        norms_sq[None, :],
    )
    return out_d, out_i

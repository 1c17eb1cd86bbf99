"""Pallas TPU kernel: fused range-masked brute-force top-k scan.

The hot op of exact prefiltering (ref: src/prefiltering.h:154-204) as ONE
kernel: for each point tile, an MXU [Q, d] x [d, T] distance block, the
per-query label-window column mask, and a running in-VMEM top-k — no [Q, n]
distance matrix ever reaches HBM and no XLA sort/top_k launch happens per
tile.

Window-locality optimizations (points are label-sorted, so a query's window
is one contiguous tile range):
  * queries are sorted by window midpoint and processed in blocks of QBLOCK;
    each block's grid walks only the block's UNION tile range, routed through
    a PrefetchScalarGridSpec index map (steps past the block's range re-map
    to the same tile, which Pallas dedups into no DMA and a predicated skip).
  * a tile whose distances can't improve any query's current k-th best skips
    the top-k merge entirely (the MXU block still runs; the VPU extraction —
    the actual per-tile cost — does not).

Exactness: identical results to the XLA path (same distance formulation,
same (dist, id) tie order) — pytest-enforced in tests/test_pallas.py via
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

TILE = 512  # points per grid step
QBLOCK = 128  # queries per grid step; [QBLOCK, TILE] f32 dists = 256 KB VMEM


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


TOUR_W = 128  # tournament group width (one lane tile; Mosaic-friendly 2D slices)


def _extract_topk_tournament(dists, ids, k):
    """Exact top-k over a wide tile via a two-level tournament: fold the T
    columns into G = T/128 lane-aligned groups, keep per-group running minima,
    and per round (a) pick the winning group from the [Q, G] table, (b) argmin
    only inside that group's [Q, 128] slice, (c) mask the taken element
    (one full-width pass) and repair that one group minimum. Identical
    (dist, id) order to _extract_topk — global argmin == argmin over group
    minima with first-min tie-breaking, because group order is column order —
    at a fraction of the full-width VPU passes. Pure 2D ops throughout
    (Mosaic rejects cross-lane reshapes inside Pallas kernels).
    """
    q, t = dists.shape
    w = min(TOUR_W, t)
    assert t % w == 0, (t, w)  # a remainder group would be silently dropped
    g = t // w
    groups_d = [dists[:, i * w : (i + 1) * w] for i in range(g)]
    groups_i = [ids[:, i * w : (i + 1) * w] for i in range(g)]
    bm = jnp.concatenate(
        [jnp.min(gd, axis=1, keepdims=True) for gd in groups_d], axis=1
    )  # [Q, G]
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (q, g), 1)
    col_t = jax.lax.broadcasted_iota(jnp.int32, (q, t), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (q, w), 1)
    out_d, out_i = [], []
    for _ in range(k):
        best = jnp.min(bm, axis=1)  # [Q]
        g_sel = jnp.argmin(bm, axis=1)  # first minimal group = lowest cols
        # select the winning group's slice (G-way select over [Q, w])
        blk_d = groups_d[0]
        blk_i = groups_i[0]
        for gi in range(1, g):
            pick = (g_sel == gi)[:, None]
            blk_d = jnp.where(pick, groups_d[gi], blk_d)
            blk_i = jnp.where(pick, groups_i[gi], blk_i)
        a = jnp.argmin(blk_d, axis=1)  # [Q] first min inside the group
        sel_w = iota_w == a[:, None]
        out_d.append(best)
        out_i.append(jnp.where(sel_w, blk_i, EMPTY_ID).min(axis=1))
        # mask the taken element: one full-width pass over dists/ids, then
        # re-derive the taken group's slice min from the updated planes
        taken_col = g_sel * w + a
        taken = col_t == taken_col[:, None]
        dists = jnp.where(taken, jnp.inf, dists)
        ids = jnp.where(taken, EMPTY_ID, ids)
        groups_d = [dists[:, i * w : (i + 1) * w] for i in range(g)]
        groups_i = [ids[:, i * w : (i + 1) * w] for i in range(g)]
        new_min = jnp.where(sel_w, jnp.inf, blk_d).min(axis=1)  # [Q]
        bm = jnp.where(iota_g == g_sel[:, None], new_min[:, None], bm)
    return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1)


def host_max_tiles(starts: "np.ndarray", ends: "np.ndarray", n: int,
                   round_to: int = 32) -> int:
    """Host-side replica of the kernel's per-block union-tile-count math
    (same stable midpoint sort, same blocking): the max count over blocks,
    rounded up to `round_to` so the set of compiled grids stays small. Pass
    the PADDED starts/ends the kernel will see."""
    import numpy as np

    q = len(starts)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    order = np.argsort(starts + ends, kind="stable")
    qb = min(q, QBLOCK)
    sb = starts[order].reshape(-1, qb)
    eb = ends[order].reshape(-1, qb)
    nonempty = eb > sb
    n_tiles = -(-n // TILE)
    blk_lo = np.min(np.where(nonempty, sb, n), axis=1)
    blk_hi = np.max(np.where(nonempty, eb, 0), axis=1)
    blk_start = np.clip(blk_lo // TILE, 0, n_tiles - 1)
    blk_end = np.clip(-(-blk_hi // TILE), 1, n_tiles)
    count = int(np.maximum(blk_end - blk_start, 1).max())
    return min(n_tiles, -(-count // round_to) * round_to)


def _scan_kernel(blk_start_ref, blk_count_ref, starts_ref, ends_ref, q_ref,
                 data_ref, norms_ref, out_d_ref, out_i_ref,
                 *, k, metric, n_real):
    # grid = (query_blocks, max_tiles); tiles iterate innermost so the
    # running top-k in out_*_ref accumulates across tiles of one query block
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_d_ref[:] = jnp.full(out_d_ref.shape, jnp.inf, out_d_ref.dtype)
        out_i_ref[:] = jnp.full(out_i_ref.shape, EMPTY_ID, out_i_ref.dtype)

    count = blk_count_ref[b]

    @pl.when(t < count)
    def _():
        tile_idx = blk_start_ref[b] + t
        # HIGHEST: fp32 dots otherwise run as one bf16 MXU pass, whose ~1e-3
        # error reorders true neighbors (see ops/distances.MATMUL_PRECISION)
        ip = jnp.dot(
            q_ref[:], data_ref[:].T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Q, T] MXU block
        if metric == METRIC_L2:
            dist = norms_ref[:] - 2.0 * ip
        else:  # MIPS
            dist = -ip
        q = dist.shape[0]
        col = tile_idx * TILE + jax.lax.broadcasted_iota(jnp.int32, (q, TILE), 1)
        valid = (
            (col >= starts_ref[:])
            & (col < ends_ref[:])
            & (col < n_real)
        )
        dist = jnp.where(valid, dist, jnp.inf)
        worst = out_d_ref[:, k - 1]
        # a finite tie at the k-th distance must still merge: the incoming id
        # is larger (tiles scan upward) but intermediate ranks can shift
        improving = jnp.any(
            (dist < worst[:, None])
            | ((dist == worst[:, None]) & (dist < jnp.inf))
        )

        @pl.when(improving)
        def _():
            ids = jnp.where(valid, col, EMPTY_ID)
            tile_d, tile_i = _extract_topk_tournament(dist, ids, k)
            comb_d = jnp.concatenate([out_d_ref[:], tile_d], axis=1)
            comb_i = jnp.concatenate([out_i_ref[:], tile_i], axis=1)
            best_d, best_i = _extract_topk(comb_d, comb_i, k)
            out_d_ref[:] = best_d
            out_i_ref[:] = best_i


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "interpret", "d_eff", "max_tiles")
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
    max_tiles: "int | None" = None,  # static upper bound on any query block's
    # tile count (host-computed from the same blocking arithmetic, rounded up
    # to bound recompiles). The grid's tile dimension otherwise spans ALL
    # n/TILE tiles, and the predicated skip steps past a block's range cost
    # ~10us of grid overhead each — at fraction 2^-2 over 200k points that is
    # 2.6x more grid steps than active ones.
    d_eff: "int | None" = None,  # lane-aligned width covering the true d:
    # the kernel streams only data[:, :d_eff] / queries[:, :d_eff]. The point
    # store fuses ||x||^2 at column d and pads to the next 128 multiple, so
    # for d = 128 the full d_pad is 256 — streaming it would DOUBLE the MXU
    # and DMA work on zero columns. This kernel takes its norms from the
    # separate norms_sq plane, and query rows are zero at and beyond column d
    # (pad_queries), so any fused-norm column inside [:d_eff] contributes 0.
):
    """Fused tiled scan. Returns (dists [Q, k], ids [Q, k] int32), L2 dists in
    the internal shifted form (see ops/distances.py). Same contract as
    ops/bruteforce.scan_bruteforce."""
    if metric not in (METRIC_L2, METRIC_MIPS):
        raise ValueError(metric)
    n, d_pad = data.shape
    w_d = d_pad if d_eff is None else min(d_eff, d_pad)  # streamed block width
    q = queries.shape[0]
    n_tiles = -(-n // TILE)
    pad = n_tiles * TILE - n
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        norms_sq = jnp.pad(norms_sq, (0, pad))

    starts = starts.astype(jnp.int32)
    ends = ends.astype(jnp.int32)
    # sort queries by window midpoint so each QBLOCK's union tile range is
    # tight; results are unsorted at the end
    order = jnp.argsort(starts + ends)
    q_s = queries[order]
    s_s = starts[order]
    e_s = ends[order]

    qb = min(q, QBLOCK)
    n_qb = q // qb  # q is pow2-padded by callers, so this divides evenly
    # per-block union tile range (empty windows contribute nothing)
    sb = s_s.reshape(n_qb, qb)
    eb = e_s.reshape(n_qb, qb)
    nonempty = eb > sb
    blk_lo = jnp.min(jnp.where(nonempty, sb, n), axis=1)
    blk_hi = jnp.max(jnp.where(nonempty, eb, 0), axis=1)
    blk_start = jnp.clip(blk_lo // TILE, 0, n_tiles - 1).astype(jnp.int32)
    blk_end = jnp.clip(-(-blk_hi // TILE), 1, n_tiles).astype(jnp.int32)
    blk_count = jnp.maximum(blk_end - blk_start, 1).astype(jnp.int32)

    def tile_map(b, t, blk_start_ref, blk_count_ref):
        # steps past the block's range re-read the last tile (no DMA, skipped)
        idx = blk_start_ref[b] + jnp.minimum(t, blk_count_ref[b] - 1)
        return (idx, 0)

    def norms_map(b, t, blk_start_ref, blk_count_ref):
        idx = blk_start_ref[b] + jnp.minimum(t, blk_count_ref[b] - 1)
        return (0, idx)

    def qrow_map(b, t, blk_start_ref, blk_count_ref):
        return (b, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_qb, n_tiles if max_tiles is None else min(n_tiles, max_tiles)),
        in_specs=[
            pl.BlockSpec((qb, 1), qrow_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), qrow_map, memory_space=pltpu.VMEM),
            # only the first w_d lanes stream through VMEM (see d_eff above)
            pl.BlockSpec((qb, w_d), qrow_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, w_d), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), norms_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, k), qrow_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, k), qrow_map, memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(_scan_kernel, k=k, metric=metric, n_real=n)
    out_d, out_i = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.float32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * q * (n_tiles * TILE) * w_d,
            bytes_accessed=(n_tiles * TILE) * w_d * 4 + q * w_d * 4,
            transcendentals=0,
        ),
    )(
        blk_start, blk_count,
        s_s[:, None], e_s[:, None], q_s, data, norms_sq[None, :],
    )
    inv = jnp.argsort(order)
    return out_d[inv], out_i[inv]

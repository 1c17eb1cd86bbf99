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
  * extraction is *insertion-based with early exit* (round-2 redesign): per
    round, each query picks its best remaining candidate via a per-128-lane
    group-minima table and inserts it into its sorted running top-k; rounds
    stop as soon as no query can improve. Per-tile cost is therefore
    O(entries + 1) passes, not O(k) — measured 1.7x over the previous
    fixed-k tournament at TILE=512, and enables TILE=2048 (4x fewer grid
    steps) for ~3.4x total.
  * candidate ids are derived from the column position (tile_idx*TILE +
    group*128 + argmin), so no id planes are materialized or masked.

Exactness: identical results to the XLA path (same fp32-HIGHEST distance
formulation, same (dist, id) tie order) — pytest-enforced in
tests/test_pallas.py via interpret mode on CPU. A bf16 single-pass variant
was measured (tools/exp_scan2.py) and rejected: extraction, not the MXU,
dominates, so bf16 saves <10% while costing exactness.
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

TILE = 2048  # points per grid step at wide rows (1 MB data tile, dbl-buffered)
QBLOCK = 128  # queries per grid step at wide rows
_W = 128  # lane-group width for the minima table


def grid_params(w_d: "int | None") -> "tuple[int, int]":
    """(tile, qblock) as a function of the streamed row width.

    Measured (tools/exp_scan2.py round-3 sweep, 200k x 128d, 2048 queries):
    at w_d <= 128, TILE=4096 / QBLOCK=256 runs ~12% faster than 2048/128
    (half the grid steps; VMEM = 2 x 2 MB data buffers + 4 MB dist scratch).
    At wider rows the double-buffered data tile alone would reach 8-16 MB,
    and QBLOCK=256 measured *slower* at TILE=2048 — keep 2048/128 there.
    w_d=None (caller streams full d_pad of unknown width) uses the wide-row
    defaults, which are VMEM-safe for every d the protocol ships."""
    if w_d is not None and w_d <= 128:
        return 4096, 256
    return TILE, QBLOCK


def host_max_tiles(starts: "np.ndarray", ends: "np.ndarray", n: int,
                   round_to: int = 8, w_d: "int | None" = None) -> int:
    """Host-side replica of the kernel's per-block union-tile-count math
    (same stable midpoint sort, same blocking): the max count over blocks,
    rounded up to `round_to` so the set of compiled grids stays small. Pass
    the PADDED starts/ends the kernel will see, and the same w_d/d_eff the
    kernel call will use (the tile size depends on it — grid_params). A
    mismatch is safe but loose: a bound computed for a smaller tile always
    covers the larger-tile grid."""
    import numpy as np

    tile, qblock = grid_params(w_d)
    q = len(starts)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    order = np.argsort(starts + ends, kind="stable")
    qb = min(q, qblock)
    sb = starts[order].reshape(-1, qb)
    eb = ends[order].reshape(-1, qb)
    nonempty = eb > sb
    n_tiles = -(-n // tile)
    blk_lo = np.min(np.where(nonempty, sb, n), axis=1)
    blk_hi = np.max(np.where(nonempty, eb, 0), axis=1)
    blk_start = np.clip(blk_lo // tile, 0, n_tiles - 1)
    blk_end = np.clip(-(-blk_hi // tile), 1, n_tiles)
    count = int(np.maximum(blk_end - blk_start, 1).max())
    return min(n_tiles, -(-count // round_to) * round_to)


def _insert_round(out_d, out_i, cand_d, cand_i, valid):
    """Insert (cand_d, cand_i) into each row's sorted-ascending (dist, id)
    top-k; rows with valid=False unchanged. Ties: the candidate goes after
    equal dists — tiles and groups scan upward in id, so this keeps
    lowest-id-first, matching the XLA path's (dist, id) order."""
    q, k = out_d.shape
    stay = out_d <= cand_d[:, None]  # prefix mask: out_d is sorted ascending
    pos = jnp.sum(stay.astype(jnp.int32), axis=1)  # insertion index per row
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (q, k), 1)
    is_pos = iota_k == pos[:, None]
    prev_d = jnp.concatenate([out_d[:, :1], out_d[:, :-1]], axis=1)
    prev_i = jnp.concatenate([out_i[:, :1], out_i[:, :-1]], axis=1)
    new_d = jnp.where(stay, out_d, jnp.where(is_pos, cand_d[:, None], prev_d))
    new_i = jnp.where(stay, out_i, jnp.where(is_pos, cand_i[:, None], prev_i))
    v = valid[:, None]
    return jnp.where(v, new_d, out_d), jnp.where(v, new_i, out_i)


def _scan_kernel(blk_start_ref, blk_count_ref, starts_ref, ends_ref, q_ref,
                 data_ref, norms_ref, out_d_ref, out_i_ref, dist_ref,
                 *, k, metric, n_real, tile, groups):
    # grid = (query_blocks, max_tiles); tiles iterate innermost so the
    # running top-k in out_*_ref accumulates across tiles of one query block
    b = pl.program_id(0)
    t = pl.program_id(1)
    g = groups

    @pl.when(t == 0)
    def _():
        out_d_ref[:] = jnp.full(out_d_ref.shape, jnp.inf, out_d_ref.dtype)
        out_i_ref[:] = jnp.full(out_i_ref.shape, EMPTY_ID, out_i_ref.dtype)

    count = blk_count_ref[b]

    @pl.when(t < count)
    def _():
        tile_idx = blk_start_ref[b] + t
        if data_ref.dtype in (jnp.int8, jnp.uint8):
            # native integer storage: bf16 casts are exact for byte values,
            # one MXU pass (see ops/distances.mxu_operands). Mosaic has no
            # direct uint8->bf16 cast (probed: int8->bf16 yes, uint8 no) —
            # unsigned hops through int16, which is exact and fuses.
            blk = data_ref[:]
            if blk.dtype == jnp.uint8:
                blk = blk.astype(jnp.int16)
            ip = jnp.dot(
                q_ref[:].astype(jnp.bfloat16),
                blk.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            )
        else:
            # HIGHEST: fp32 dots otherwise run as one bf16 MXU pass, whose
            # ~1e-3 error reorders true neighbors (ops/distances)
            ip = jnp.dot(
                q_ref[:], data_ref[:].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [Q, T] MXU block
        if metric == METRIC_L2:
            dist = norms_ref[:] - 2.0 * ip
        else:  # MIPS
            dist = -ip
        q = dist.shape[0]
        col = tile_idx * tile + jax.lax.broadcasted_iota(jnp.int32, (q, tile), 1)
        valid = (
            (col >= starts_ref[:])
            & (col < ends_ref[:])
            & (col < n_real)
        )
        dist_ref[:] = jnp.where(valid, dist, jnp.inf)
        # per-128-lane-group minima table [Q, G]
        gm = jnp.concatenate(
            [jnp.min(dist_ref[:, i * _W:(i + 1) * _W], axis=1, keepdims=True)
             for i in range(g)], axis=1)
        worst = out_d_ref[:, k - 1]

        def cond(carry):
            gm, worst = carry
            return jnp.any(jnp.min(gm, axis=1) < worst)

        def body(carry):
            gm, worst = carry
            best = jnp.min(gm, axis=1)  # [Q]
            g_sel = jnp.argmin(gm, axis=1)  # [Q] first minimal group
            improving = best < worst
            # each query selects its own winning group's slice
            blk = dist_ref[:, 0:_W]
            for gi in range(1, g):
                blk = jnp.where((g_sel == gi)[:, None],
                                dist_ref[:, gi * _W:(gi + 1) * _W], blk)
            a = jnp.argmin(blk, axis=1)  # [Q] first min inside the slice
            cand_i = tile_idx * tile + g_sel * _W + a
            nd, ni = _insert_round(out_d_ref[:], out_i_ref[:], best, cand_i,
                                   improving)
            out_d_ref[:] = nd
            out_i_ref[:] = ni
            # mask the taken element and repair that one group minimum
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (q, _W), 1)
            sel_w = (iota_w == a[:, None]) & improving[:, None]
            new_min = jnp.min(jnp.where(sel_w, jnp.inf, blk), axis=1)
            for gi in range(g):
                pick = ((g_sel == gi) & improving)[:, None]
                dist_ref[:, gi * _W:(gi + 1) * _W] = jnp.where(
                    pick & sel_w, jnp.inf, dist_ref[:, gi * _W:(gi + 1) * _W])
            iota_g = jax.lax.broadcasted_iota(jnp.int32, gm.shape, 1)
            gm = jnp.where((iota_g == g_sel[:, None]) & improving[:, None],
                           new_min[:, None], gm)
            return gm, nd[:, k - 1]

        jax.lax.while_loop(cond, body, (gm, worst))


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
    # n/TILE tiles; predicated skip steps past a block's range still cost
    # grid overhead each.
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
    ops/bruteforce.scan_bruteforce. Q must be a multiple of QBLOCK (or < QBLOCK
    and a power of two) — callers pad."""
    if metric not in (METRIC_L2, METRIC_MIPS):
        raise ValueError(metric)
    n, d_pad = data.shape
    w_d = d_pad if d_eff is None else min(d_eff, d_pad)  # streamed block width
    tile, qblock = grid_params(w_d)
    q = queries.shape[0]
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
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

    qb = min(q, qblock)
    n_qb = q // qb  # q is QBLOCK-multiple-padded by callers
    # per-block union tile range (empty windows contribute nothing)
    sb = s_s.reshape(n_qb, qb)
    eb = e_s.reshape(n_qb, qb)
    nonempty = eb > sb
    blk_lo = jnp.min(jnp.where(nonempty, sb, n), axis=1)
    blk_hi = jnp.max(jnp.where(nonempty, eb, 0), axis=1)
    blk_start = jnp.clip(blk_lo // tile, 0, n_tiles - 1).astype(jnp.int32)
    blk_end = jnp.clip(-(-blk_hi // tile), 1, n_tiles).astype(jnp.int32)
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
            pl.BlockSpec((tile, w_d), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), norms_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, k), qrow_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, k), qrow_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((qb, tile), jnp.float32)],
    )
    kern = functools.partial(_scan_kernel, k=k, metric=metric, n_real=n,
                             tile=tile, groups=tile // _W)
    out_d, out_i = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.float32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * q * (n_tiles * tile) * w_d,
            bytes_accessed=(n_tiles * tile) * w_d * 4 + q * w_d * 4,
            transcendentals=0,
        ),
    )(
        blk_start, blk_count,
        s_s[:, None], e_s[:, None], q_s, data, norms_sq[None, :],
    )
    inv = jnp.argsort(order)
    return out_d[inv], out_i[inv]

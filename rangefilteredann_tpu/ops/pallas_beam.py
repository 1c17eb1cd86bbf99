"""Pallas TPU kernel: fused batched beam search over inline neighbor blocks.

The XLA beam search (ops/beam_search.batched_beam_search) runs ONE
lax.while_loop step per expanded node, and every step pays several
XLA-level ops over [Q, B]/[Q, R, w] operands — gathers, a merge sort (or
merge-path compare network), masks — each a separate HLO with its own HBM
round trip for the big gather. Measured effective rate: ~14 GFLOP/s at
200k/beam 40 (round-3 verdict weak #1). This kernel fuses the whole search
loop into one Pallas program: frontiers live in VMEM for the entire search,
each step issues per-query async DMAs for the expanded node's inline
[R, w] vector block + a packed meta row (neighbor ids/norms), computes the
R candidate distances with one MXU matmul, and merges candidates into the
sorted frontier with an insertion pass. HBM traffic per step is exactly the
R*w*4 bytes of the blocks touched — the algorithmic minimum.

Semantics are EXACT XLA-path parity for the supported configuration
(expand=1, k=0 i.e. no cut pruning, no exclude, no degree_limit, fp32
inline blocks — the query path of every postfilter/tree search):

  * selection: min (dist, id) unexplored frontier slot == first unexplored
    slot of the (dist, id)-sorted XLA frontier (beamSearch.h:108 order).
  * candidate filter: STRICT `cand_dist < worst-of-full-frontier` against
    the PRE-STEP frontier tail (ref: beamSearch.h:133-144; the XLA path
    drops dist-ties with the old worst even when the id would win a sort).
  * merge: sequential (dist, id)-lexicographic insertion against the
    CURRENT tail reproduces the batch top-B merge exactly (streaming top-B
    == batch top-B; dup-by-id keeps the frontier copy, matching
    explored-copy priority).

The frontier layout is [QB queries (sublanes), B beam slots (lanes)],
kept (dist, id)-sorted ascending — so the kernel's output frontier needs
no post-sort and feeds window_filter_topk directly.

Distance trick (per-query candidate blocks can't share one matmul),
selected by the static `layout` knob (env RFANN_PALLAS_LAYOUT):

  * "3d" (default): per-query blocks DMA into a [QB, R_pad, w] scratch and
    one batched dot_general ([QB, R, w] x [QB, w] -> [QB, R]) computes every
    query's candidate inner products — the exact op the XLA inline path uses
    (ops/distances.gathered_distances), so products/sums match bit-for-bit.
  * "2d" (fallback if Mosaic rejects the batched contraction): blocks land
    side by side in a [R, QB*w] scratch; one elementwise multiply against
    the lane-concatenated query row [1, QB*w] and one MXU matmul with the
    in-kernel 0/1 block-segment matrix S[c, i] = (c // w == i) reduce each
    query's own w lanes — a block-diagonal batched matvec as one dense
    matmul, with no cross-lane reshapes (Mosaic rejects those; CLAUDE.md).

Insertion cost (round-4 A/B: the kernel ran 0.72-0.98x of XLA, worst at
small beams where per-step fixed cost dominates): in the 3d layout each
candidate first computes a cheap [QB, 1] pre-filter (id valid, strictly
better than the pre-step worst, lexicographically below the current tail)
and the full [QB, beam] dup-check + shift-insert runs under a scalar
pl.when only when ANY query accepts — at steady state most of the R
candidates fail for every query, so the common-path cost per candidate
drops ~4x.

DMA cost: the per-step per-query block+meta DMA pair is issue-bound
(2*QB descriptor writes per step). In the 3d layout both issue and wait
are pl.when-gated on the query's active flag (lane 1 of cur_scr) —
finished and padded queries stop costing DMAs, which matters because the
while loop runs until the slowest query in the block finishes. The
RFANN_PALLAS_PACKED knob further halves issues by appending the meta row
to each f32 inline block (one DMA per expansion).

The 2d fallback layout keeps UNGATED DMAs and insertion — the exact
configuration proven on real chips at 16:02; a pl.when-gated 2d variant
hung the 20:20 on-chip run (remote-compile hang or on-chip deadlock),
so every pl.when in this kernel is 3d-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.data import METRIC_L2, METRIC_MIPS

EMPTY_ID = 2**31 - 1  # plain int: jnp consts are rejected as kernel captures

import os as _os

# queries per grid block: DMA parallelism + lane fill vs VMEM for the S/V
# scratches (S is qb^2*w*4 bytes). Tunable for on-chip sweeps.
QB = int(_os.environ.get("RFANN_PALLAS_QB", "64"))

# distance-layout variant (module docstring): "3d" batched dot_general, or
# "2d" segment-matmul fallback should Mosaic reject the batched contraction.
LAYOUT = _os.environ.get("RFANN_PALLAS_LAYOUT", "3d")

# one-DMA packing: concatenate the meta row as row R of each f32 inline
# block ([m, R+1, w]) so a step issues ONE descriptor per active query
# instead of two (DMA issue is the kernel's dominant per-step fixed cost).
# f32 + meta_width == w + layout "3d" only (an int8/bf16 row can't hold
# f32 meta bits, and the 2d layout can't slice per-query meta lanes back
# out without a cross-lane reshape).
PACKED = _os.environ.get("RFANN_PALLAS_PACKED", "0") != "0"


def meta_layout(r: int, quant: bool):
    """(width, ids_lane_offset) of the packed meta row.

    fp32/bf16 blocks: [norms 0:R | ids 64:64+R], 128 lanes (R <= 64).
    int8-quantized:   [norms 0:R | scale @64 | ids 128:128+R], 256 lanes
    (R = 64 fills lanes 0:64 with norms, so the scale needs the next group).
    """
    if r > 64:
        raise ValueError(f"meta packing supports R <= 64, got {r}")
    if quant:
        return 256, 128
    return 128, 64


def build_meta(nbrs: jax.Array, nbr_norms: jax.Array,
               nbr_scale: "jax.Array | None" = None) -> jax.Array:
    """Pack per-node neighbor norms + ids (+ dequant scale) into one f32 row
    so each expansion fetches ONE meta DMA besides the vector block. ids are
    stored bitcast (f32 view of int32); -1 padding survives the round trip."""
    m, r = nbrs.shape
    w, ids_at = meta_layout(r, nbr_scale is not None)
    meta = jnp.zeros((m, w), dtype=jnp.float32)
    meta = meta.at[:, :r].set(nbr_norms.astype(jnp.float32))
    if nbr_scale is not None:
        meta = meta.at[:, 64].set(nbr_scale.astype(jnp.float32))
    meta = meta.at[:, ids_at:ids_at + r].set(
        jax.lax.bitcast_convert_type(nbrs.astype(jnp.int32), jnp.float32))
    return meta


def _beam_kernel(qcat_ref, starts_ref, d0_ref, act_ref,
                 vecs_hbm, meta_hbm,
                 fd_ref, fid_ref, nvis_ref, cmps_ref,
                 v_scr, prod_scr, s_scr, meta_scr, cur_scr, fe_scr,
                 dma_sems,
                 *, beam, r, w, limit, metric, m, ids_at, quant, qb, layout,
                 packed):
    if layout == "2d":
        # --- one-time per block: S segment matrix ---
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (qb * w, qb), 0)
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (qb * w, qb), 1)
        s_scr[:] = ((iota_c // w) == iota_i).astype(jnp.float32)
    # Zero-init V and meta fully: rows of queries whose DMA is skipped
    # (inactive/padded — see the pl.when-gated issue below) feed the
    # distance contraction, and garbage VMEM can be NaN; in the 2d layout a
    # NaN times an S-matrix zero still poisons EVERY query's segment sum.
    v_scr[...] = jnp.zeros(v_scr.shape, v_scr.dtype)
    meta_scr[...] = jnp.zeros(meta_scr.shape, jnp.float32)

    act = act_ref[:] != 0  # [QB, 1]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (qb, beam), 1)
    slot0 = iota_b == 0
    fd_ref[:] = jnp.where(slot0 & act, d0_ref[:], jnp.inf)
    fid_ref[:] = jnp.where(slot0 & act, starts_ref[:], EMPTY_ID)
    fe_scr[:] = jnp.zeros((qb, beam), jnp.int32)
    nvis_ref[:] = jnp.zeros((qb, 1), jnp.int32)
    cmps_ref[:] = jnp.where(act, 1, 0).astype(jnp.int32)

    def cond(carry):
        return carry != 0

    def body(carry):
        fd = fd_ref[:]
        fid = fid_ref[:]
        fe = fe_scr[:]

        # --- select the min-(dist, id) unexplored slot per query ---
        unexp = (fe == 0) & (fid != EMPTY_ID)
        active = (jnp.any(unexp, axis=1, keepdims=True)
                  & (nvis_ref[:] < limit))  # [QB, 1]
        md = jnp.min(jnp.where(unexp, fd, jnp.inf), axis=1, keepdims=True)
        hit_d = unexp & (fd == md)
        mi = jnp.min(jnp.where(hit_d, fid, EMPTY_ID), axis=1, keepdims=True)
        hit = hit_d & (fid == mi)  # exactly one slot (ids unique)
        fe_scr[:] = jnp.where(hit & active, 1, fe)
        nvis_ref[:] = nvis_ref[:] + active.astype(jnp.int32)
        cur_scr[:, 0:1] = jnp.clip(jnp.where(active, mi, 0), 0, m - 1)
        cur_scr[:, 1:2] = active.astype(jnp.int32)  # scalar-readable flag

        # --- per-query DMAs: inline vector block + packed meta row.
        # In the 3d layout, issue AND wait are pl.when-gated on the query's
        # active flag: finished/padded queries' candidates are masked out
        # anyway (`valid = ... & active` below), and per-step DMA issue is
        # the kernel's dominant fixed cost — the loop runs until the
        # SLOWEST query in the block finishes, so the tail steps carry
        # mostly inactive queries. Skipped rows keep their zero/stale V
        # block; the flag cannot change between issue and wait, so
        # semaphore counts always balance. The 2d layout keeps UNGATED
        # per-query DMAs (and the ungated insertion below): it is the
        # Mosaic-rejection fallback and must stay the exact configuration
        # proven on-chip at 16:02 — a pl.when-gated 2d variant HUNG the
        # 20:20 on-chip run. ---
        gated = layout == "3d"
        nv = r + 1 if packed else r  # packed blocks carry the meta row

        def v_dst(i):
            return (v_scr.at[pl.ds(0, r), pl.ds(i * w, w)]
                    if layout == "2d" else v_scr.at[i, pl.ds(0, nv)])

        def _issue(i):
            idx = cur_scr[i, 0]
            pltpu.make_async_copy(
                vecs_hbm.at[idx], v_dst(i), dma_sems.at[0]).start()
            if not packed:
                pltpu.make_async_copy(
                    meta_hbm.at[idx], meta_scr.at[i], dma_sems.at[1]).start()

        def _wait_v(i):
            idx = cur_scr[i, 0]
            pltpu.make_async_copy(
                vecs_hbm.at[idx], v_dst(i), dma_sems.at[0]).wait()

        for i in range(qb):
            if gated:
                pl.when(cur_scr[i, 1] != 0)(functools.partial(_issue, i))
            else:
                _issue(i)
        for i in range(qb):
            if gated:
                pl.when(cur_scr[i, 1] != 0)(functools.partial(_wait_v, i))
            else:
                _wait_v(i)

        # --- distances. int8 blocks upcast to f32 (exact); the wrapper
        # pre-rounds the query row to bf16 for quant blocks, so every
        # product matches the XLA path's bf16xbf16 -> f32 MXU products
        # exactly; HIGHEST keeps the f32 sums exact. The meta-row DMAs
        # (needed only after the contraction) stay in flight across it. ---
        if layout == "2d":
            # one elementwise + one MXU segment-sum matmul + transpose
            prod_scr[:] = v_scr[:].astype(jnp.float32) * qcat_ref[0:1, :]
            ips_t = jax.lax.dot_general(  # [R_pad, QB]
                prod_scr[:], s_scr[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            # batched matvec: same dot_general as the XLA inline path
            # (ops/distances.gathered_distances) — [QB, R_pad] directly
            ips_t = jax.lax.dot_general(
                v_scr[:].astype(jnp.float32), qcat_ref[:],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        if packed:
            # meta arrived as row r of each query's packed block — one
            # strided VMEM slice replaces the second DMA entirely
            meta_scr[...] = v_scr[:, r, :]
        else:
            def _wait_m(i):
                idx = cur_scr[i, 0]
                pltpu.make_async_copy(
                    meta_hbm.at[idx], meta_scr.at[i], dma_sems.at[1]).wait()

            for i in range(qb):
                if gated:
                    pl.when(cur_scr[i, 1] != 0)(
                        functools.partial(_wait_m, i))
                else:
                    _wait_m(i)
        ips = ips_t.T if layout == "2d" else ips_t  # [QB, R_pad]
        nrm = meta_scr[:, :r]  # [QB, R]
        cids = jax.lax.bitcast_convert_type(
            meta_scr[:, ids_at:ids_at + r], jnp.int32)  # [QB, R]
        if quant:
            # x ~= scale[node] * x_hat (per expanded node, broadcast per row)
            sip = meta_scr[:, 64:65] * ips[:, :r]
            cd_all = nrm - 2.0 * sip if metric == METRIC_L2 else -sip
        elif metric == METRIC_L2:
            cd_all = nrm - 2.0 * ips[:, :r]
        else:  # MIPS
            cd_all = -ips[:, :r]
        valid = (cids >= 0) & active
        cmps_ref[:] = cmps_ref[:] + jnp.sum(
            valid, axis=1, keepdims=True).astype(jnp.int32)
        cd_all = jnp.where(valid, cd_all, jnp.inf)
        cids = jnp.where(valid, cids, EMPTY_ID)

        # --- sequential exact insertion of the R candidates ---
        # strict filter vs the PRE-STEP worst (XLA/ref parity: ties with the
        # old worst drop), lexicographic (dist, id) vs the CURRENT tail.
        # The cheap [QB, 1] pre-filter (validity, pre-step worst, current
        # tail) needs only two tail lanes of the frontier; in the 3d layout
        # the [QB, beam] dup-check + shift-insert run under pl.when only
        # when some query passes it — the dup-check alone cannot flip
        # pre-true to accepted for a DIFFERENT query, so skipping on
        # all-pre-false is exact. The 2d fallback runs it unconditionally
        # (the proven-on-chip form — see the DMA comment above).
        wd0 = fd_ref[:, beam - 1:beam]  # pre-step tail dist
        for j in range(r):
            cd = cd_all[:, j:j + 1]
            cid = cids[:, j:j + 1]
            tail_d = fd_ref[:, beam - 1:beam]
            tail_i = fid_ref[:, beam - 1:beam]
            lex_lt = (cd < tail_d) | ((cd == tail_d) & (cid < tail_i))
            pre = (cid != EMPTY_ID) & (cd < wd0) & lex_lt  # [QB, 1]

            def _insert(cd=cd, cid=cid, pre=pre):
                fd = fd_ref[:]
                fid = fid_ref[:]
                fe = fe_scr[:]
                dup = jnp.any(fid == cid, axis=1, keepdims=True)
                # sorted insertion (ties: candidate after equal (d, id<cid))
                stay = (fd < cd) | ((fd == cd) & (fid <= cid))
                keep = stay | dup | ~pre
                pos = jnp.sum(stay.astype(jnp.int32), axis=1, keepdims=True)
                is_pos = iota_b == pos
                prev_d = jnp.concatenate([fd[:, :1], fd[:, :-1]], axis=1)
                prev_i = jnp.concatenate([fid[:, :1], fid[:, :-1]], axis=1)
                prev_e = jnp.concatenate([fe[:, :1], fe[:, :-1]], axis=1)
                fd_ref[:] = jnp.where(keep, fd, jnp.where(is_pos, cd, prev_d))
                fid_ref[:] = jnp.where(
                    keep, fid, jnp.where(is_pos, cid, prev_i))
                fe_scr[:] = jnp.where(keep, fe, jnp.where(is_pos, 0, prev_e))

            if gated:
                pl.when(jnp.any(pre))(_insert)
            else:
                _insert()

        still = ((fe_scr[:] == 0) & (fid_ref[:] != EMPTY_ID)
                 ).any(axis=1, keepdims=True) & (nvis_ref[:] < limit)
        return jnp.any(still).astype(jnp.int32)

    jax.lax.while_loop(cond, body, jnp.int32(1))


def pallas_beam_search_inline(
        nbr_vecs, meta, queries, starts, d0, active, *, beam, limit, metric,
        interpret=False, qb=None, layout=None, packed=False):
    """Resolve the env-default knobs OUTSIDE the jit so an explicit
    per-call layout (e.g. beam_search.pallas_beam_search_safe's "2d"
    fallback after a Mosaic rejection) reaches a fresh jit cache key.
    With packed=True, nbr_vecs must be the [m, R+1, w] f32 array from
    pack_meta_into_blocks (meta as row R; one DMA per expansion)."""
    return _pallas_beam_search_inline(
        nbr_vecs, meta, queries, starts, d0, active, beam=beam, limit=limit,
        metric=metric, interpret=interpret,
        qb=QB if qb is None else qb,
        layout=LAYOUT if layout is None else layout, packed=packed)


def pack_meta_into_blocks(nbr_vecs: jax.Array, meta: jax.Array) -> jax.Array:
    """[m, R+1, w] f32: each node's inline block with its meta row appended
    as row R. Only valid for f32 blocks whose width equals the meta width
    (module PACKED comment)."""
    assert nbr_vecs.dtype == jnp.float32
    assert meta.shape[1] == nbr_vecs.shape[2], (meta.shape, nbr_vecs.shape)
    return jnp.concatenate([nbr_vecs, meta[:, None, :]], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("beam", "limit", "metric", "interpret", "qb", "layout",
                     "packed"),
)
def _pallas_beam_search_inline(
    nbr_vecs: jax.Array,  # [m, R, w] inline neighbor vectors (f32/bf16/int8)
    meta: jax.Array,  # [m, 128|256] packed norms+ids(+scale) (build_meta)
    queries: jax.Array,  # [Q, w] f32 (exactly the inline width)
    starts: jax.Array,  # [Q] int32 slab start ids
    d0: jax.Array,  # [Q] f32 start-node distances (computed by caller,
    # identical formula to the XLA init — ops/beam_search.py:316-319)
    active: jax.Array,  # [Q] bool
    *,
    beam: int,
    limit: int,
    metric: str,
    interpret: bool = False,
    qb: "int | None" = None,
    layout: "str | None" = None,
    packed: bool = False,
):
    """Fused beam search over inline blocks. Returns (f_ids [Q, beam] i32,
    f_d [Q, beam] f32, n_vis [Q] i32, cmps [Q] i32) with the frontier
    (dist, id)-sorted ascending — the XLA batched_beam_search contract for
    the supported (expand=1, k=0) configuration. Q must be a QB multiple."""
    if metric not in (METRIC_L2, METRIC_MIPS):
        raise ValueError(metric)
    m, r, w = nbr_vecs.shape
    if packed:
        assert layout == "3d" and nbr_vecs.dtype == jnp.float32, (
            "packed blocks are 3d + f32 only")
        r -= 1  # row r of each block is the meta row
    q = queries.shape[0]
    assert layout in ("2d", "3d"), layout
    assert q % qb == 0, f"Q={q} must be a multiple of qb={qb}"
    assert queries.shape[1] == w
    n_blocks = q // qb
    r_pad = -(-nbr_vecs.shape[1] // 8) * 8  # scratch rows incl. packed meta
    quant = meta.shape[1] == 256
    _, ids_at = meta_layout(r, quant)

    if nbr_vecs.dtype in (jnp.int8, jnp.uint8):
        # int8 blocks: the XLA path runs these as bf16 MXU passes
        # (ops/distances.mxu_operands), which rounds the QUERY to bf16 too —
        # pre-round here so every product bit-matches. bf16 STORAGE blocks
        # instead upcast to f32 before the XLA matmul (query unrounded), so
        # they take the plain f32 path here.
        queries = queries.astype(jnp.bfloat16).astype(jnp.float32)
    if layout == "2d":
        # Mosaic requires a block's sublane dim to be a multiple of 8 (or
        # the full array dim) — a (1, qb*w) qcat block fails to lower on
        # real TPUs (interpret mode doesn't check). Replicate each block's
        # lane-concatenated query row 8x; the kernel reads sublane 0.
        qcat = jnp.repeat(queries.reshape(n_blocks, qb * w), 8, axis=0)
        q_spec = pl.BlockSpec((8, qb * w), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
        v_scratch = [
            pltpu.VMEM((r_pad, qb * w), nbr_vecs.dtype),  # V: vector blocks
            pltpu.VMEM((r_pad, qb * w), jnp.float32),  # prod
            pltpu.VMEM((qb * w, qb), jnp.float32),  # S segment matrix
        ]
    else:
        # 3d: the query block is the natural [qb, w]; V holds per-query
        # [R_pad, w] blocks batch-major for the batched dot_general. prod/S
        # are unused — tiny placeholder scratches keep one kernel signature.
        qcat = queries
        q_spec = pl.BlockSpec((qb, w), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
        v_scratch = [
            pltpu.VMEM((qb, r_pad, w), nbr_vecs.dtype),  # V: vector blocks
            pltpu.VMEM((8, 128), jnp.float32),  # unused (2d prod)
            pltpu.VMEM((8, 128), jnp.float32),  # unused (2d S)
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            q_spec,
            pl.BlockSpec((qb, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # vecs stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # meta stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((qb, beam), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, beam), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=v_scratch + [
            pltpu.VMEM((qb, meta.shape[1]), jnp.float32),  # meta rows
            pltpu.VMEM((qb, 128), jnp.int32),  # cur node ids
            pltpu.VMEM((qb, beam), jnp.int32),  # explored flags
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(
        _beam_kernel, beam=beam, r=r, w=w, limit=int(limit),
        metric=metric, m=m, ids_at=ids_at, quant=quant, qb=qb, layout=layout,
        packed=packed)
    fd, fid, nvis, cmps = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, beam), jnp.float32),
            jax.ShapeDtypeStruct((q, beam), jnp.int32),
            jax.ShapeDtypeStruct((q, 1), jnp.int32),
            jax.ShapeDtypeStruct((q, 1), jnp.int32),
        ],
        # TPU interpret mode (CPU) emulates the async DMAs + semaphores;
        # plain interpret=True does not
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        qcat,
        starts.astype(jnp.int32)[:, None],
        d0.astype(jnp.float32)[:, None],
        active.astype(jnp.int32)[:, None],
        nbr_vecs,
        meta,
    )
    return fid, fd, nvis[:, 0], cmps[:, 0]

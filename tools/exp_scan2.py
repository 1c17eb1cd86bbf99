"""Scan-kernel redesign experiments (round 2, verdict item 2).

Times variants of the fused prefilter scan on the real TPU against the
current production kernel (ops/pallas_scan.py), on the bench workload:
200k x 128d clustered points, 2048 queries, window fraction 2^-2, k=10.

Variants:
  * extraction: "tournament" (production: per-tile exact top-k + merge) vs
    "insert" (new: per-round pick each query's best remaining candidate via
    group minima and insert into the sorted running top-k; rounds early-exit
    when no query can improve — expected rounds/tile ~ entries+1, not k)
  * dot dtype: fp32-HIGHEST (exact, 6 MXU passes) vs bf16 (1 pass, needs an
    fp32 re-rank of survivors to restore exactness)
  * TILE: 512 (production) / 1024 / 2048 points per grid step

Usage: python tools/exp_scan2.py [--reps 10]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

import os
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from rangefilteredann_tpu.ops.pallas_scan import (
    QBLOCK, host_max_tiles, pallas_scan_bruteforce,
)
from rangefilteredann_tpu.utils.data import make_pointset, pad_queries

EMPTY_ID = 2**31 - 1


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# new kernel: insertion extraction, ids derived from column position
# ---------------------------------------------------------------------------

def _insert_round(out_d, out_i, cand_d, cand_i, valid):
    """Insert (cand_d, cand_i) into each row's sorted-ascending (dist, id)
    top-k; rows with valid=False unchanged. Ties: candidate goes after equal
    dists (tiles/groups scan upward in id, so this keeps lowest-id-first)."""
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


def _scan_kernel_v2(blk_start_ref, blk_count_ref, starts_ref, ends_ref, q_ref,
                    data_ref, norms_ref, out_d_ref, out_i_ref, dist_ref,
                    *, k, tile, bf16, n_real, groups):
    b = pl.program_id(0)
    t = pl.program_id(1)
    w = 128
    g = groups  # tile // 128

    @pl.when(t == 0)
    def _():
        out_d_ref[:] = jnp.full(out_d_ref.shape, jnp.inf, out_d_ref.dtype)
        out_i_ref[:] = jnp.full(out_i_ref.shape, EMPTY_ID, out_i_ref.dtype)

    count = blk_count_ref[b]

    @pl.when(t < count)
    def _():
        tile_idx = blk_start_ref[b] + t
        if bf16:
            ip = jnp.dot(
                q_ref[:].astype(jnp.bfloat16),
                data_ref[:].astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            )
        else:
            ip = jnp.dot(
                q_ref[:], data_ref[:].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        dist = norms_ref[:] - 2.0 * ip  # [Q, T]
        q = dist.shape[0]
        col = tile_idx * tile + jax.lax.broadcasted_iota(jnp.int32, (q, tile), 1)
        valid = (col >= starts_ref[:]) & (col < ends_ref[:]) & (col < n_real)
        dist = jnp.where(valid, dist, jnp.inf)
        dist_ref[:] = dist
        # group minima [Q, G]
        gm = jnp.concatenate(
            [jnp.min(dist_ref[:, i * w:(i + 1) * w], axis=1, keepdims=True)
             for i in range(g)], axis=1)
        worst = out_d_ref[:, k - 1]

        def cond(carry):
            gm, worst = carry
            return jnp.any(jnp.min(gm, axis=1) < worst)

        def body(carry):
            gm, worst = carry
            best = jnp.min(gm, axis=1)  # [Q]
            g_sel = jnp.argmin(gm, axis=1)  # [Q]
            improving = best < worst
            # select each query's winning group slice
            blk = dist_ref[:, 0:w]
            for gi in range(1, g):
                blk = jnp.where((g_sel == gi)[:, None],
                                dist_ref[:, gi * w:(gi + 1) * w], blk)
            a = jnp.argmin(blk, axis=1)  # [Q] first min in slice
            cand_i = tile_idx * tile + g_sel * w + a
            nd, ni = _insert_round(out_d_ref[:], out_i_ref[:], best, cand_i,
                                   improving)
            out_d_ref[:] = nd
            out_i_ref[:] = ni
            # mask the taken element and repair that group's min
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (q, w), 1)
            sel_w = (iota_w == a[:, None]) & improving[:, None]
            new_min = jnp.min(jnp.where(sel_w, jnp.inf, blk), axis=1)
            for gi in range(g):
                pick = ((g_sel == gi) & improving)[:, None]
                dist_ref[:, gi * w:(gi + 1) * w] = jnp.where(
                    pick & sel_w, jnp.inf, dist_ref[:, gi * w:(gi + 1) * w])
            iota_g = jax.lax.broadcasted_iota(jnp.int32, gm.shape, 1)
            gm = jnp.where((iota_g == g_sel[:, None]) & improving[:, None],
                           new_min[:, None], gm)
            return gm, nd[:, k - 1]

        jax.lax.while_loop(cond, body, (gm, worst))


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile", "bf16", "d_eff", "max_tiles", "interpret", "qblock"))
def scan_v2(data, norms_sq, queries, starts, ends, k, tile=512, bf16=False,
            d_eff=None, max_tiles=None, interpret=False, qblock=QBLOCK):
    n, d_pad = data.shape
    w_d = d_pad if d_eff is None else min(d_eff, d_pad)
    q = queries.shape[0]
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        norms_sq = jnp.pad(norms_sq, (0, pad))
    starts = starts.astype(jnp.int32)
    ends = ends.astype(jnp.int32)
    order = jnp.argsort(starts + ends)
    q_s = queries[order]
    s_s = starts[order]
    e_s = ends[order]
    qb = min(q, qblock)
    n_qb = q // qb
    sb = s_s.reshape(n_qb, qb)
    eb = e_s.reshape(n_qb, qb)
    nonempty = eb > sb
    blk_lo = jnp.min(jnp.where(nonempty, sb, n), axis=1)
    blk_hi = jnp.max(jnp.where(nonempty, eb, 0), axis=1)
    blk_start = jnp.clip(blk_lo // tile, 0, n_tiles - 1).astype(jnp.int32)
    blk_end = jnp.clip(-(-blk_hi // tile), 1, n_tiles).astype(jnp.int32)
    blk_count = jnp.maximum(blk_end - blk_start, 1).astype(jnp.int32)

    def tile_map(b, t, bs, bc):
        return (bs[b] + jnp.minimum(t, bc[b] - 1), 0)

    def norms_map(b, t, bs, bc):
        return (0, bs[b] + jnp.minimum(t, bc[b] - 1))

    def qrow_map(b, t, bs, bc):
        return (b, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_qb, n_tiles if max_tiles is None else min(n_tiles, max_tiles)),
        in_specs=[
            pl.BlockSpec((qb, 1), qrow_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), qrow_map, memory_space=pltpu.VMEM),
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
    kern = functools.partial(_scan_kernel_v2, k=k, tile=tile, bf16=bf16,
                             n_real=n, groups=tile // 128)
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
    )(blk_start, blk_count, s_s[:, None], e_s[:, None], q_s, data,
      norms_sq[None, :])
    inv = jnp.argsort(order)
    return out_d[inv], out_i[inv]


@functools.partial(jax.jit, static_argnames=("k",))
def rerank_fp32(data, norms_sq, queries, cand_ids, k):
    """Exact fp32 re-rank of per-query candidates (restores exactness after a
    bf16 scan). cand_ids [Q, K'] int32, EMPTY_ID padded."""
    safe = jnp.clip(cand_ids, 0, data.shape[0] - 1)
    vecs = data[safe]  # [Q, K', d_pad]
    nrm = norms_sq[safe]
    ip = jax.lax.dot_general(
        vecs, queries[..., None],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[..., 0]
    dist = nrm - 2.0 * ip
    dist = jnp.where(cand_ids == EMPTY_ID, jnp.inf, dist)
    # exact (dist, id) ascending top-k: k rounds of argmin
    q, kp = dist.shape
    colid = cand_ids
    out_d, out_i = [], []
    d = dist
    ids = colid
    for _ in range(k):
        arg = jnp.argmin(d, axis=1)
        sel = jax.lax.broadcasted_iota(jnp.int32, (q, kp), 1) == arg[:, None]
        out_d.append(jnp.min(d, axis=1))
        out_i.append(jnp.where(sel, ids, EMPTY_ID).min(axis=1))
        d = jnp.where(sel, jnp.inf, d)
        ids = jnp.where(sel, EMPTY_ID, ids)
    return jnp.stack(out_d, 1), jnp.stack(out_i, 1)


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--nq", type=int, default=2048)
    args = ap.parse_args()

    N, D, NQ, K = args.n, 128, args.nq, 10
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    order = np.argsort(rng.uniform(size=N), kind="stable")
    points = points[order]
    q_assign = rng.integers(0, 1000, size=NQ)
    queries = (centers[q_assign] + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)
    width = int(N * 0.25)
    starts = rng.integers(0, N - width, size=NQ).astype(np.int32)
    ends = (starts + width).astype(np.int32)

    ps = make_pointset(points, "l2")
    qp = jnp.asarray(pad_queries(queries, D, ps.d_pad))
    s_dev = jnp.asarray(starts)
    e_dev = jnp.asarray(ends)
    log(f"n={N} nq={NQ} width={width} d_pad={ps.d_pad} norm_col={ps.norm_col}")

    # fp64 oracle on a query subset (matmul form — the broadcast form is 52 GB)
    n_or = 256
    x64 = points.astype(np.float64)
    q64 = queries[:n_or].astype(np.float64)
    d2 = (x64 ** 2).sum(1)[None, :] - 2.0 * (q64 @ x64.T)
    for i in range(n_or):
        d2[i, :starts[i]] = np.inf
        d2[i, ends[i]:] = np.inf
    gt = np.argsort(d2, axis=1, kind="stable")[:, :K]

    def check(ids, name):
        got = np.asarray(ids[:n_or])
        ok = np.mean([set(got[i]) == set(gt[i]) for i in range(n_or)])
        exact = float(np.mean(got == gt))
        log(f"  {name}: set-match {ok:.4f} pos-match {exact:.4f}")

    d_eff = 128
    mt = host_max_tiles(starts, ends, N)

    def timeit(name, fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(args.reps)]
        jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / args.reps
        log(f"{name}: {dt*1e3:.2f} ms -> {NQ/dt:.0f} qps")
        return out, dt

    # production baseline
    out, _ = timeit("prod tournament fp32 T=512", lambda: pallas_scan_bruteforce(
        ps.data, ps.norms_sq, qp, s_dev, e_dev, K, "l2",
        d_eff=128, max_tiles=mt))
    check(out[1], "prod")

    def max_tiles_for(tile, qblock):
        n_tiles = -(-N // tile)
        ordr = np.argsort(starts + ends, kind="stable")
        qb = min(NQ, qblock)
        sb = starts[ordr].reshape(-1, qb)
        eb = ends[ordr].reshape(-1, qb)
        lo = sb.min(1) // tile
        hi = -(-eb.max(1) // tile)
        return min(n_tiles, int(np.ceil((hi - lo).max() / 8) * 8))

    # round-3 sweep: QBLOCK x TILE (fewer grid steps per launch), fp32 only
    for qblock in (128, 256, 512):
        for tile in (2048, 4096):
            mt_t = max_tiles_for(tile, qblock)
            name = f"v2 insert fp32 QB={qblock} T={tile} (mt={mt_t})"
            try:
                out, dt = timeit(
                    name,
                    lambda tile=tile, qblock=qblock, mt_t=mt_t: scan_v2(
                        ps.data, ps.norms_sq, qp, s_dev, e_dev, K, tile=tile,
                        d_eff=128, max_tiles=mt_t, qblock=qblock))
                check(out[1], name)
            except Exception as e:
                log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")
    # bf16 + rerank at the best grid shape for reference
    for qblock, tile in ((256, 2048),):
        mt_t = max_tiles_for(tile, qblock)
        name = f"v2 insert bf16 QB={qblock} T={tile}"
        out, dt = timeit(name, lambda: scan_v2(
            ps.data, ps.norms_sq, qp, s_dev, e_dev, K, tile=tile, bf16=True,
            d_eff=128, max_tiles=mt_t, qblock=qblock))
        check(out[1], name)

        def e2e(tile=tile, mt_t=mt_t, qblock=qblock):
            d32, i32 = scan_v2(ps.data, ps.norms_sq, qp, s_dev, e_dev,
                               32, tile=tile, bf16=True, d_eff=128,
                               max_tiles=mt_t, qblock=qblock)
            return rerank_fp32(ps.data, ps.norms_sq, qp, i32, K)
        out, dt = timeit(name + " k'=32+rerank", e2e)
        check(out[1], name + "+rerank")


if __name__ == "__main__":
    main()

"""Scan-kernel extraction experiment v3: batched per-group extraction.

The production kernel (ops/pallas_scan.py) is extraction-bound: each
inserted candidate costs ~2 full [QB, TILE] VPU passes (group-slice
selection chain + lane masking), and the bf16-matmul experiment showed the
MXU is <10% of kernel time.  v3 restructures extraction so one full-width
mask+rescan pass serves up to G=TILE/128 insertions:

  outer round (dynamic while):
    * inner while over the [QB, G] group-minima/argmin tables only: each
      round every query inserts its own current best (dist, id) candidate
      into its sorted top-k (lexicographic (dist, id) insert — exact tie
      order by construction, not by insertion order), and that group's
      table entry is retired.  O(QB x G) per inner round — no [QB, TILE]
      traffic.
    * one [QB, TILE] pass masks ALL retired lanes and rebuilds the
      minima/argmin tables.  Unconditional retirement keeps termination
      trivially monotone (every non-empty group loses its head each round).

Expected: rounds/tile drops from ~max-insertions (10-20 on early tiles of
a 256-query block) to ~max-multiplicity-per-group (2-3), i.e. ~2x fewer
full-width extraction passes.

Usage:
  CPU correctness: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/exp_scan3.py --interpret --n 20000 --nq 256
  TPU timing:      python tools/exp_scan3.py [--reps 10]
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
    grid_params, host_max_tiles, pallas_scan_bruteforce,
)
from rangefilteredann_tpu.utils.data import make_pointset, pad_queries

EMPTY_ID = 2**31 - 1
_W = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _insert_lex(out_d, out_i, cand_d, cand_i, valid):
    """Insert (cand_d, cand_i) into each row's (dist, id)-lex-sorted
    ascending top-k; rows with valid=False unchanged.  Unlike the
    production insert (which relies on ascending extraction order for tie
    placement), the id participates in the comparison, so ANY insertion
    order yields the exact (dist, id) order."""
    q, k = out_d.shape
    cd = cand_d[:, None]
    ci = cand_i[:, None]
    stay = (out_d < cd) | ((out_d == cd) & (out_i < ci))
    pos = jnp.sum(stay.astype(jnp.int32), axis=1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (q, k), 1)
    is_pos = iota_k == pos[:, None]
    prev_d = jnp.concatenate([out_d[:, :1], out_d[:, :-1]], axis=1)
    prev_i = jnp.concatenate([out_i[:, :1], out_i[:, :-1]], axis=1)
    new_d = jnp.where(stay, out_d, jnp.where(is_pos, cd, prev_d))
    new_i = jnp.where(stay, out_i, jnp.where(is_pos, ci, prev_i))
    v = valid[:, None]
    return jnp.where(v, new_d, out_d), jnp.where(v, new_i, out_i)


def _scan_kernel_v3(blk_start_ref, blk_count_ref, starts_ref, ends_ref, q_ref,
                    data_ref, norms_ref, out_d_ref, out_i_ref, dist_ref,
                    *, k, metric, n_real, tile, groups):
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
        ip = jnp.dot(
            q_ref[:], data_ref[:].T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == "l2":
            dist = norms_ref[:] - 2.0 * ip
        else:
            dist = -ip
        q = dist.shape[0]
        col = tile_idx * tile + jax.lax.broadcasted_iota(jnp.int32, (q, tile), 1)
        valid = (
            (col >= starts_ref[:])
            & (col < ends_ref[:])
            & (col < n_real)
        )
        dist_ref[:] = jnp.where(valid, dist, jnp.inf)

        def tables():
            gms, ams = [], []
            for gi in range(g):
                sl = dist_ref[:, gi * _W:(gi + 1) * _W]
                gms.append(jnp.min(sl, axis=1, keepdims=True))
                ams.append(jnp.argmin(sl, axis=1)[:, None].astype(jnp.int32))
            return jnp.concatenate(gms, 1), jnp.concatenate(ams, 1)

        gm, am = tables()
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (q, g), 1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (q, _W), 1)

        def outer_cond(carry):
            gm, am = carry
            m = jnp.min(gm, axis=1)
            wd = out_d_ref[:, k - 1]
            # conservative on ties (id not compared): at worst one spurious
            # round, which still retires every group head -> terminates
            return jnp.any((m < wd) | ((m == wd) & (m < jnp.inf)))

        def outer_body(carry):
            gm, am = carry

            def inner_cond(c):
                gm, imp = c
                return jnp.any(imp)

            def pick(gm):
                m = jnp.min(gm, axis=1)
                gsel = jnp.argmin(gm, axis=1).astype(jnp.int32)
                onehot = iota_g == gsel[:, None]
                lane = jnp.sum(jnp.where(onehot, am, 0), axis=1)
                cid = tile_idx * tile + gsel * _W + lane
                wd = out_d_ref[:, k - 1]
                wi = out_i_ref[:, k - 1]
                imp = ((m < wd) | ((m == wd) & (cid < wi))) & (m < jnp.inf)
                return m, gsel, cid, imp

            def inner_body(c):
                gm, imp = c
                m, gsel, cid, _ = pick(gm)
                nd, ni = _insert_lex(out_d_ref[:], out_i_ref[:], m, cid, imp)
                out_d_ref[:] = nd
                out_i_ref[:] = ni
                # retire this group's head for the rest of the outer round
                gm = jnp.where((iota_g == gsel[:, None]) & imp[:, None],
                               jnp.inf, gm)
                _, _, _, imp2 = pick(gm)
                return gm, imp2

            _, _, _, imp0 = pick(gm)
            jax.lax.while_loop(inner_cond, inner_body, (gm, imp0))

            # ONE full-width pass: retire every group head (inserted or
            # dead — worst only decreases, so a skipped head stays dead)
            # and rebuild the tables
            gms, ams = [], []
            for gi in range(g):
                sl = dist_ref[:, gi * _W:(gi + 1) * _W]
                sl = jnp.where(iota_w == am[:, gi][:, None], jnp.inf, sl)
                dist_ref[:, gi * _W:(gi + 1) * _W] = sl
                gms.append(jnp.min(sl, axis=1, keepdims=True))
                ams.append(jnp.argmin(sl, axis=1)[:, None].astype(jnp.int32))
            return jnp.concatenate(gms, 1), jnp.concatenate(ams, 1)

        jax.lax.while_loop(outer_cond, outer_body, (gm, am))


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile", "d_eff", "max_tiles", "interpret",
                     "qblock"))
def scan_v3(data, norms_sq, queries, starts, ends, k, metric="l2", tile=4096,
            d_eff=None, max_tiles=None, interpret=False, qblock=256):
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
    kern = functools.partial(_scan_kernel_v3, k=k, metric=metric, n_real=n,
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
    )(blk_start, blk_count, s_s[:, None], e_s[:, None], q_s, data,
      norms_sq[None, :])
    inv = jnp.argsort(order)
    return out_d[inv], out_i[inv]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--nq", type=int, default=2048)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--dups", action="store_true",
                    help="inject duplicate points (exact-tie stress)")
    args = ap.parse_args()

    N, D, NQ, K = args.n, 128, args.nq, 10
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    if args.dups:
        # every 3rd point duplicates an earlier one -> exact distance ties
        src = rng.integers(0, N, size=N // 3)
        points[np.arange(0, N, 3)[: len(src)]] = points[src]
    order = np.argsort(rng.uniform(size=N), kind="stable")
    points = points[order]
    q_assign = rng.integers(0, 1000, size=NQ)
    queries = (centers[q_assign] + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)
    if args.dups:
        queries[: NQ // 4] = points[rng.integers(0, N, size=NQ // 4)]
    width = int(N * 0.25)
    starts = rng.integers(0, N - width, size=NQ).astype(np.int32)
    ends = (starts + width).astype(np.int32)
    # a few degenerate windows (empty / smaller than k)
    starts[:4] = [100, 200, 300, 400]
    ends[:4] = [100, 203, 301, 404]

    ps = make_pointset(points, "l2")
    qp = jnp.asarray(pad_queries(queries, D, ps.d_pad))
    s_dev = jnp.asarray(starts)
    e_dev = jnp.asarray(ends)
    log(f"n={N} nq={NQ} width={width} interpret={args.interpret}")

    d_eff = 128
    mt = host_max_tiles(starts, ends, N, w_d=d_eff)

    def timeit(name, fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(args.reps)]
        jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / args.reps
        log(f"{name}: {dt*1e3:.2f} ms -> {NQ/dt:.0f} qps")
        return out, dt

    prod, _ = timeit("prod", lambda: pallas_scan_bruteforce(
        ps.data, ps.norms_sq, qp, s_dev, e_dev, K, "l2",
        d_eff=d_eff, max_tiles=mt, interpret=args.interpret))

    def mt_for(tile, qblock):
        n_tiles = -(-N // tile)
        ordr = np.argsort(starts + ends, kind="stable")
        qb = min(NQ, qblock)
        sb = starts[ordr].reshape(-1, qb)
        eb = ends[ordr].reshape(-1, qb)
        nonempty = eb > sb
        lo = np.where(nonempty, sb, N).min(1) // tile
        hi = -(-np.where(nonempty, eb, 0).max(1) // tile)
        cnt = np.maximum(hi - lo, 1).max()
        return min(n_tiles, int(np.ceil(cnt / 8) * 8))

    grids = [(4096, 256)] if args.interpret else [
        (4096, 256), (2048, 256), (4096, 128), (8192, 256)]
    for tile, qblock in grids:
        m = mt_for(tile, qblock)
        name = f"v3 T={tile} QB={qblock} (mt={m})"
        try:
            out, _ = timeit(name, lambda tile=tile, qblock=qblock, m=m: scan_v3(
                ps.data, ps.norms_sq, qp, s_dev, e_dev, K, tile=tile,
                d_eff=d_eff, max_tiles=m, qblock=qblock,
                interpret=args.interpret))
        except Exception as e:
            log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        pd, pi = np.asarray(prod[0]), np.asarray(prod[1])
        vd, vi = np.asarray(out[0]), np.asarray(out[1])
        same_i = float(np.mean(pi == vi))
        same_d = float(np.mean((pd == vd) | (np.isinf(pd) & np.isinf(vd))))
        log(f"  {name}: id pos-match vs prod {same_i:.6f} dist {same_d:.6f}")
        if same_i < 1.0:
            bad = np.argwhere(pi != vi)
            r, c = bad[0]
            log(f"  first mismatch row {r} col {c}: prod "
                f"{pi[r].tolist()} v3 {vi[r].tolist()}")
            log(f"    dists prod {pd[r].tolist()}")
            log(f"    dists v3   {vd[r].tolist()}")


if __name__ == "__main__":
    main()

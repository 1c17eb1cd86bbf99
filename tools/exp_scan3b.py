"""Scan-kernel extraction experiment v3b: single-while batched extraction.

exp_scan3's nested while_loop (inner insert loop inside the outer
round loop) crashes the Mosaic remote compiler (HTTP 500, subprocess exit 1)
on every grid shape. v3b keeps v3's batched idea — amortize one full-width
[QB, TILE] mask+rescan pass over MANY insertions — but restructures to a
SINGLE lax.while_loop (the production kernel's shape): each outer round
python-unrolls U insert steps against the [QB, G] group-minima/argmin
tables, then does one full-width pass that retires every round-start group
head (safe unconditionally: a head that didn't beat the current worst never
will — the worst only decreases) and rebuilds the tables.

Also probes a MINIMAL nested-while pallas kernel to pin the Mosaic failure.

Usage:
  CPU correctness: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/exp_scan3b.py --interpret --n 20000 --nq 256
  TPU timing:      python tools/exp_scan3b.py [--reps 10]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
import traceback

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
    host_max_tiles, pallas_scan_bruteforce,
)
from rangefilteredann_tpu.utils.data import make_pointset, pad_queries

EMPTY_ID = 2**31 - 1
_W = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_nested_while(interpret):
    """Minimal pallas kernel with a while inside a while — does Mosaic
    accept it at all?"""

    def kern(x_ref, o_ref):
        def outer_cond(c):
            i, acc = c
            return i < 3

        def outer_body(c):
            i, acc = c

            def inner_cond(d):
                j, acc = d
                return j < 2

            def inner_body(d):
                j, acc = d
                return j + 1, acc + x_ref[:]

            _, acc = jax.lax.while_loop(inner_cond, inner_body, (0, acc))
            return i + 1, acc

        _, acc = jax.lax.while_loop(
            outer_cond, outer_body, (0, jnp.zeros_like(x_ref[:])))
        o_ref[:] = acc

    x = jnp.ones((8, 128), jnp.float32)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=interpret)(x)
        jax.block_until_ready(out)
        log(f"nested-while probe: OK (sum={float(out.sum())})")
    except Exception:
        log("nested-while probe: FAILED")
        log(traceback.format_exc()[-1500:])


def _insert_lex(out_d, out_i, cand_d, cand_i, valid):
    """(dist, id)-lexicographic sorted-ascending top-k insert; rows with
    valid=False unchanged. Any insertion order yields the exact (dist, id)
    order because the id participates in the comparison."""
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


def _scan_kernel_v3b(blk_start_ref, blk_count_ref, starts_ref, ends_ref,
                     q_ref, data_ref, norms_ref, out_d_ref, out_i_ref,
                     dist_ref, *, k, metric, n_real, tile, groups, unroll):
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

        def rebuild():
            gms, ams = [], []
            for gi in range(g):
                sl = dist_ref[:, gi * _W:(gi + 1) * _W]
                gms.append(jnp.min(sl, axis=1, keepdims=True))
                ams.append(jnp.argmin(sl, axis=1)[:, None].astype(jnp.int32))
            return jnp.concatenate(gms, 1), jnp.concatenate(ams, 1)

        gm0, am0 = rebuild()
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (q, g), 1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (q, _W), 1)

        def head_imp(gm, am):
            """Per query: is its current best table candidate a strict
            (dist, id)-lexicographic improvement over the running worst?"""
            m = jnp.min(gm, axis=1)
            gsel = jnp.argmin(gm, axis=1).astype(jnp.int32)
            onehot = iota_g == gsel[:, None]
            lane = jnp.sum(jnp.where(onehot, am, 0), axis=1)
            cid = tile_idx * tile + gsel * _W + lane
            wd = out_d_ref[:, k - 1]
            wi = out_i_ref[:, k - 1]
            imp = ((m < wd) | ((m == wd) & (cid < wi))) & (m < jnp.inf)
            return m, onehot, cid, imp

        def cond(carry):
            gm, am = carry
            _, _, _, imp = head_imp(gm, am)
            return jnp.any(imp)

        def body(carry):
            gm, am = carry
            gm_in = gm  # round-start heads (for the dead-head mask below)
            # U unrolled insert steps against the tables only (no [Q, TILE]
            # traffic): each step inserts every query's current best
            # candidate and retires that group's table entry
            for _ in range(unroll):
                m, onehot, cid, imp = head_imp(gm, am)
                nd, ni = _insert_lex(out_d_ref[:], out_i_ref[:], m, cid, imp)
                out_d_ref[:] = nd
                out_i_ref[:] = ni
                gm = jnp.where(onehot & imp[:, None], jnp.inf, gm)
            # ONE full-width pass: retire heads that were INSERTED this round
            # (gm == inf) or are provably DEAD (round-start head strictly
            # worse than the updated worst — the worst only decreases, so
            # they can never enter). Heads that simply didn't get a turn in
            # the U steps stay live for the next round.
            wd = out_d_ref[:, k - 1]
            retire = jnp.isinf(gm) | (gm_in > wd[:, None])
            gms, ams = [], []
            for gi in range(g):
                sl = dist_ref[:, gi * _W:(gi + 1) * _W]
                sl = jnp.where(
                    (iota_w == am[:, gi][:, None]) & retire[:, gi][:, None],
                    jnp.inf, sl)
                dist_ref[:, gi * _W:(gi + 1) * _W] = sl
                gms.append(jnp.min(sl, axis=1, keepdims=True))
                ams.append(jnp.argmin(sl, axis=1)[:, None].astype(jnp.int32))
            return jnp.concatenate(gms, 1), jnp.concatenate(ams, 1)

        jax.lax.while_loop(cond, body, (gm0, am0))


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile", "d_eff", "max_tiles", "interpret",
                     "qblock", "unroll"))
def scan_v3b(data, norms_sq, queries, starts, ends, k, metric="l2", tile=4096,
             d_eff=None, max_tiles=None, interpret=False, qblock=256,
             unroll=4):
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
    kern = functools.partial(_scan_kernel_v3b, k=k, metric=metric, n_real=n,
                             tile=tile, groups=tile // _W, unroll=unroll)
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
    ap.add_argument("--dups", action="store_true")
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()

    if not args.skip_probe:
        probe_nested_while(args.interpret)

    N, D, NQ, K = args.n, 128, args.nq, 10
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    if args.dups:
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

    cases = [(4096, 256, 4)] if args.interpret else [
        (4096, 256, 4), (4096, 256, 2), (4096, 256, 8), (2048, 256, 4)]
    for tile, qblock, unroll in cases:
        m = mt_for(tile, qblock)
        name = f"v3b T={tile} QB={qblock} U={unroll} (mt={m})"
        try:
            out, _ = timeit(name, lambda tile=tile, qblock=qblock, m=m,
                            unroll=unroll: scan_v3b(
                ps.data, ps.norms_sq, qp, s_dev, e_dev, K, tile=tile,
                d_eff=d_eff, max_tiles=m, qblock=qblock, unroll=unroll,
                interpret=args.interpret))
        except Exception:
            log(f"  {name}: FAILED")
            log(traceback.format_exc()[-2500:])
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
                f"{pi[r].tolist()} v3b {vi[r].tolist()}")


if __name__ == "__main__":
    main()

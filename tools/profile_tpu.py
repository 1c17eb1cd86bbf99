"""TPU microbenchmarks for the hot query-path ops.

Times (device-blocked, warm compile cache):
  1. pallas scan kernel-only + PrefilterIndex end-to-end
  2. batched_beam_search kernel-only across (beam, expand)
  3. XLA row-gather floor: [E] rows from [n, d] vs contiguous [n, R*d] blocks
  4. merge-sort microbench (the beam kernel's per-step selection cost)

Run:  nohup setsid python tools/profile_tpu.py > /tmp/profile.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 200_000
D = 128
K = 10
NQ = 2048
R = 48


def t_best(fn, reps=5):
    fn()  # warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    queries = (centers[rng.integers(0, 1000, size=NQ)]
               + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)
    starts_f = rng.uniform(0, 0.75, size=NQ)
    filters = np.stack([starts_f, starts_f + 0.25], axis=1)

    from rangefilteredann_tpu.utils.data import (
        make_pointset, sort_by_labels, first_geq, pad_queries)
    from rangefilteredann_tpu.ops.pallas_scan import pallas_scan_bruteforce
    from rangefilteredann_tpu.ops.beam_search import batched_beam_search

    pts_sorted, labels_sorted, dec = sort_by_labels(points, labels)
    ps = make_pointset(pts_sorted, "l2")
    win_lo = first_geq(labels_sorted, filters[:, 0]).astype(np.int32)
    win_hi = first_geq(labels_sorted, filters[:, 1]).astype(np.int32)
    qpad = jnp.asarray(pad_queries(queries, ps.d, ps.d_pad))
    wl, wh = jnp.asarray(win_lo), jnp.asarray(win_hi)

    SKIP12 = os.environ.get("PROFILE_SKIP12")
    # ---- 1. pallas scan kernel ----
    def scan():
        d, i = pallas_scan_bruteforce(ps.data, ps.norms_sq, qpad, wl, wh, K, "l2")
        jax.block_until_ready((d, i))
    dt = t_best(scan) if not SKIP12 else np.inf
    print(f"pallas_scan kernel: {dt*1e3:.1f} ms  ({NQ/dt:.0f} qps)", flush=True)

    from rangefilteredann_tpu.models.prefilter import PrefilterIndex
    from rangefilteredann_tpu import build_query_params
    idx = PrefilterIndex(points, labels, metric="Euclidian")
    qp = build_query_params(K, K)
    dt = t_best(lambda: idx.batch_search(queries, filters, NQ, qp)) if not SKIP12 else np.inf
    print(f"prefilter e2e: {dt*1e3:.1f} ms  ({NQ/dt:.0f} qps)", flush=True)

    # ---- 2. beam search kernel on the REAL cached Vamana graph ----
    cache = ("bench_cache/vamana_100_48_1.200000_0.000005_0.999999_"
             "200000.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            nbrs = z["nbrs"]
        print("using cached Vamana graph", flush=True)
    else:
        nbrs = rng.integers(0, N, size=(N, R)).astype(np.int32)
    nbrs_dev = jnp.asarray(nbrs)
    s2g = jnp.arange(N, dtype=jnp.int32)
    st = jnp.zeros((NQ,), jnp.int32)
    for beam in () if SKIP12 else (40, 80):
        for expand in (1, 2, 4, 8):
            def bs():
                r = batched_beam_search(
                    ps.data, ps.norms_sq, nbrs_dev, s2g, qpad, st,
                    beam=beam, k=0, cut=jnp.float32(1.35),
                    limit=jnp.int32(N), metric="l2",
                    expand=expand, norm_col=ps.norm_col, identity_map=True,
                )
                jax.block_until_ready(r.frontier_ids)
            dt = t_best(bs, reps=3)
            print(f"beam={beam} expand={expand}: {dt*1e3:.1f} ms "
                  f"({NQ/dt:.0f} qps)", flush=True)

    # ---- 3. gather floor ----
    data32 = ps.data  # [N, d_pad]
    E = NQ * 96  # rows per expansion step at beam 40, expand 2
    idxs = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))

    @jax.jit
    def row_gather(arr, ix):
        return arr[ix].sum()
    dt = t_best(lambda: jax.block_until_ready(row_gather(data32, idxs)))
    print(f"row gather {E} rows x {data32.shape[1]}f32: {dt*1e3:.2f} ms "
          f"({E/dt/1e6:.0f} M rows/s)", flush=True)

    narrow = jax.block_until_ready(data32[:, :128] + 0)  # [N, 128] compact

    dt = t_best(lambda: jax.block_until_ready(row_gather(narrow, idxs)))
    print(f"row gather {E} rows x 128f32: {dt*1e3:.2f} ms "
          f"({E/dt/1e6:.0f} M rows/s)", flush=True)

    # build the big block array ON DEVICE (a 614MB host upload over the
    # tunnel takes minutes): tile the point store into [N//8, R*D]
    blk_n = N // 8
    blocks = jnp.reshape(
        jnp.tile(ps.data[: blk_n // 2], (2, R * D // ps.data.shape[1] + 1))[
            :blk_n, : R * D], (blk_n, R * D))
    blocks = jax.block_until_ready(blocks)
    bidx = jnp.asarray(rng.integers(0, blk_n, size=NQ * 2).astype(np.int32))

    dt = t_best(lambda: jax.block_until_ready(row_gather(blocks, bidx)))
    rows_eq = NQ * 2 * R
    print(f"block gather {NQ*2} x [{R}*{D}]f32 (= {rows_eq} rows): "
          f"{dt*1e3:.2f} ms ({rows_eq/dt/1e6:.0f} M rows-eq/s, "
          f"{NQ*2*R*D*4/dt/1e9:.0f} GB/s)", flush=True)

    bf16 = blocks.astype(jnp.bfloat16)

    dt = t_best(lambda: jax.block_until_ready(row_gather(bf16, bidx)))
    print(f"block gather bf16: {dt*1e3:.2f} ms "
          f"({rows_eq/dt/1e6:.0f} M rows-eq/s)", flush=True)

    # ---- 4. merge sort microbench (per-step selection cost) ----
    W = 40 + 96
    md = jnp.asarray(rng.normal(size=(NQ, W)).astype(np.float32))
    mi = jnp.asarray(rng.integers(0, N, size=(NQ, W)).astype(np.int32))

    @jax.jit
    def two_sorts(d, i):
        k1, d1 = jax.lax.sort((i, d), num_keys=1)
        d2, k2 = jax.lax.sort((d1, k1), num_keys=2)
        return d2, k2
    dt = t_best(lambda: jax.block_until_ready(two_sorts(md, mi)))
    print(f"merge 2x sort [{NQ},{W}]: {dt*1e3:.2f} ms/step", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()

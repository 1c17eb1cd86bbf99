"""End-of-round TPU batch, one process:

  1. split-launch experiment: does splitting the prefilter scan into 2/4
     sub-launches overlap uploads with compute on the tunnel? (round-3
     candidate for the e2e headline)
  2. 12M-point uint8 store smoke (RedCaps scale, verdict item 5 "a 12M
     store fits with room for one graph"): native-byte PointSet + exact
     scans on chip, with HBM arithmetic logged
  3. bench.py main() — the final family record for the round

Run: nohup setsid python tools/final_batch.py > /tmp/final_batch.log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def phase_split():
    from rangefilteredann_tpu import build_query_params
    from rangefilteredann_tpu.models import base
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    rng = np.random.default_rng(42)
    N, D, NQ = 200_000, 128, 10240
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    points = (centers[rng.integers(0, 1000, N)]
              + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)
    lo = rng.uniform(0, 0.75, NQ)
    filters = np.stack([lo, lo + 0.25], 1)
    idx = PrefilterIndex(points, labels, metric="Euclidian")
    qp = build_query_params(10, 10)
    for chunk in (16384, 5120, 2560):
        base.SCAN_CHUNK = chunk
        idx.batch_search(queries, filters, NQ, qp)  # warm/compile
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            idx.batch_search(queries, filters, NQ, qp)
            best = min(best, time.perf_counter() - t0)
        log(f"split: SCAN_CHUNK={chunk}: {best*1e3:.1f} ms "
            f"-> {NQ/best:.0f} qps")
    base.SCAN_CHUNK = 16384


def phase_12m_uint8():
    from rangefilteredann_tpu import build_query_params
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    N, D, NQ = 12_000_000, 512, 512
    rng = np.random.default_rng(3)
    centers = rng.integers(30, 225, size=(1000, D)).astype(np.uint8)
    data = np.empty((N, D), dtype=np.uint8)
    log("generating 12M x 512 uint8...")
    for lo in range(0, N, 1_000_000):
        hi = lo + 1_000_000
        a = rng.integers(0, 1000, hi - lo)
        noise = rng.integers(-25, 26, size=(hi - lo, D))
        data[lo:hi] = np.clip(
            centers[a].astype(np.int16) + noise, 0, 255).astype(np.uint8)
    labels = rng.uniform(size=N)
    queries = np.clip(
        centers[rng.integers(0, 1000, NQ)].astype(np.int16)
        + rng.integers(-25, 26, size=(NQ, D)), 0, 255).astype(np.uint8)

    t0 = time.time()
    idx = PrefilterIndex(data, labels, metric="Euclidian")
    log(f"12M uint8 store resident in {time.time()-t0:.0f}s "
        f"(data {N*D/2**30:.1f} GiB as native bytes; an R=48 graph needs "
        f"{N*48*4/2**30:.1f} GiB more — fits 16 GB HBM with headroom)")
    for fexp in (2, 6):
        frac = 2.0 ** -fexp
        lo = rng.uniform(0, 1 - frac, NQ)
        filters = np.stack([lo, lo + frac], 1)
        idx.batch_search(queries.astype(np.float32), filters, NQ,
                         build_query_params(10, 10))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            ids, d = idx.batch_search(queries.astype(np.float32), filters,
                                      NQ, build_query_params(10, 10))
            best = min(best, time.perf_counter() - t0)
        log(f"12M uint8 2^-{fexp} prefilter exact: {NQ/best:.0f} qps "
            f"(finite rows: {np.isfinite(np.where(d < 3e38, d, np.inf)).all(1).mean():.2f})")
    del idx


def phase_1m_r64_inline():
    """R=64/L=200 1M graph (cached by protocol phase D) + int8-quantized
    inline under a raised budget: targets >=0.99 recall AND inline-class
    QPS at 2^-2 simultaneously (the R=64 inline slab is 8.5 GB; data +
    adjacency + workspace still fit 16 GB HBM)."""
    from rangefilteredann_tpu.models import base
    base.INLINE_BUDGET = int(9e9)

    from protocol_1m import make_data
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    N, D, NQ = 1_000_000, 128, 2048
    rng, points, labels, queries = make_data(N, D, seed=7)
    bp = BuildParams(R=64, L=200, alpha=1.2, cache_path="bench_cache/")
    idx = PostfilterVamanaIndex(points, labels, bp)
    log(f"R64 inline dtype: {idx._graph.inline_dtype} "
        f"scale={'yes' if idx._graph.nbr_scale is not None else 'no'}")
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    frac = 0.25
    lo = rng.uniform(0, 1 - frac, NQ)
    filters = np.stack([lo, lo + frac], 1)
    ids_gt, _ = pre.batch_search(queries, filters, NQ,
                                 build_query_params(10, 10))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]
    for beam, fm in ((40, 2), (80, 2), (80, 4)):
        qp = build_query_params(10, beam, final_beam_multiply=fm)
        idx.batch_search(queries, filters, NQ, qp)
        best = 1e9
        ids = None
        for _ in range(2):
            t0 = time.perf_counter()
            ids, _ = idx.batch_search(queries, filters, NQ, qp)
            best = min(best, time.perf_counter() - t0)
        rec = np.mean([len(gt_sets[i] & set(ids[i].astype(np.int64)
                                            .tolist())) / 10
                       for i in range(NQ)])
        log(f"1M R64L200+inline 2^-2 beam={beam} fm={fm}: recall={rec:.4f} "
            f"qps={NQ/best:.0f}")
    del idx, pre


def phase_bench():
    import bench

    bench.main()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    for name, fn in (("split", phase_split),
                     ("1m-r64-inline", phase_1m_r64_inline),
                     ("12m-uint8", phase_12m_uint8),
                     ("bench", phase_bench)):
        try:
            log(f"=== {name} ===")
            fn()
        except Exception:
            log(f"{name} FAILED\n{traceback.format_exc()}")
    log("final_batch done")

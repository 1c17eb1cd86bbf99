"""DEEP-10M-scale demonstration (BASELINE config #3 shape: 10M x 96d
angular-style vectors, uniform labels, k=10) on one chip.

What fits today on 16 GB HBM: the fp32 store (10M x 128-padded = 5.1 GB),
the exact prefilter scan, and one flat Vamana graph (1.9 GB, R=48) with the
beam-doubling postfilter. A full 10M SUPER tree needs lazy per-row device
residency (each overlapping row is a ~20M-slab; 14 rows ~ 50 GB of adjacency)
— designed for round 3; the B-WST rows have the same residency math.

Run: nohup setsid python tools/demo_10m.py > /tmp/demo10m.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rangefilteredann_tpu import BuildParams, build_query_params
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

N, D, K, NQ = 10_000_000, 96, 10, 2048


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    rng = np.random.default_rng(23)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    log("generating 10M points...")
    points = np.empty((N, D), dtype=np.float32)
    for lo in range(0, N, 1_000_000):
        hi = lo + 1_000_000
        a = rng.integers(0, 1000, hi - lo)
        # noise ~= center scale: ultra-tight normalized clusters degenerate
        # MIPS RobustPrune (alpha * dist(p*,p') <= dist(p,p') with dists near
        # -1 prunes everything — the reference's own rule, index.h:94-103;
        # see CLAUDE.md round-3 notes) and no real angular dataset looks
        # like that
        points[lo:hi] = centers[a] + 1.0 * rng.normal(
            size=(hi - lo, D)).astype(np.float32)
    points /= np.linalg.norm(points, axis=1, keepdims=True)
    labels = rng.uniform(size=N)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + 1.0 * rng.normal(size=(NQ, D))).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # angular data searched with MIPS (reference: run_our_method.py:218)
    pre = PrefilterIndex(points, labels, metric="mips")
    qp10 = build_query_params(K, K)
    for fexp in (2, 6):
        frac = 2.0 ** -fexp
        lo = rng.uniform(0, 1 - frac, NQ)
        filters = np.stack([lo, lo + frac], 1)
        pre.batch_search(queries, filters, NQ, qp10)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            ids_gt, _ = pre.batch_search(queries, filters, NQ, qp10)
            best = min(best, time.perf_counter() - t0)
        log(f"10M 2^-{fexp} prefilter exact: {NQ/best:.0f} qps")
        if fexp == 2:
            gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]
            filters_2 = filters

    # the graph index builds its own pointset — free the prefilter's 5.1 GB
    # device copy first or the two stores + build transients exceed HBM
    del pre
    import gc

    gc.collect()

    t0 = time.time()
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/"),
        metric="mips")
    log(f"10M graph build/load: {(time.time()-t0)/60:.1f} min")
    for beam, fm in ((80, 2), (160, 2)):
        qp = build_query_params(K, beam, final_beam_multiply=fm)
        idx.batch_search(queries, filters_2, NQ, qp)
        t0 = time.perf_counter()
        ids, _ = idx.batch_search(queries, filters_2, NQ, qp)
        dt = time.perf_counter() - t0
        rec = np.mean([len(gt_sets[i] & set(ids[i].astype(np.int64).tolist()))
                       / K for i in range(NQ)])
        log(f"10M 2^-2 graph beam={beam} fm={fm}: recall={rec:.4f} "
            f"qps={NQ/dt:.0f}")
    log("demo_10m done")


if __name__ == "__main__":
    main()

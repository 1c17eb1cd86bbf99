"""1M-point B-WST measurements (requires tools/prebuild_1m_tree.py caches).

The tree's regime: small filter fractions over a large dataset, where the
flat postfilter's doubling loop collapses (61 QPS at 2^-6) and the exact
scan still costs a full window sweep.

Run: nohup setsid python tools/bench_1m_tree.py > /tmp/tree1m_q.log 2>&1 &
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

from rangefilteredann_tpu import (
    BuildParams, RangeFilterTreeIndex, build_query_params)
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

N = 1_000_000
D = 128
K = 10
NQ = 2048
CLUSTERS = 1000


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(CLUSTERS, D)).astype(np.float32)
    points = (centers[rng.integers(0, CLUSTERS, N)]
              + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    queries = (centers[rng.integers(0, CLUSTERS, NQ)]
               + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)

    t0 = time.time()
    tree = RangeFilterTreeIndex(
        points, labels, cutoff=1000, split_factor=2,
        build_params=BuildParams(R=48, L=100, alpha=1.2,
                                 cache_path="bench_cache/"))
    log(f"tree load: {time.time() - t0:.0f}s ({len(tree._offsets)} rows)")
    gt = PrefilterIndex(points, labels, metric="Euclidian")

    for fexp in (2, 6, 10):
        frac = 2.0 ** -fexp
        lo = rng.uniform(0, 1 - frac, NQ)
        filters = np.stack([lo, lo + frac], 1)
        qp10 = build_query_params(K, K)
        ids_gt, _ = gt.batch_search(queries, filters, NQ, qp10)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            gt.batch_search(queries, filters, NQ, qp10)
            best = min(best, time.perf_counter() - t0)
        log(f"frac 2^-{fexp} prefilter exact: {NQ/best:.0f} qps")
        gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]

        for method in ("fenwick", "optimized_postfilter", "three_split"):
            for beam in (40, 80):
                qp = build_query_params(K, beam, final_beam_multiply=2)
                ids, _ = tree.batch_search(queries, filters, NQ, method, qp)
                t0 = time.perf_counter()
                ids, _ = tree.batch_search(queries, filters, NQ, method, qp)
                dt = time.perf_counter() - t0
                rec = np.mean([
                    len(gt_sets[i] & set(ids[i].astype(np.int64).tolist())) / K
                    for i in range(NQ)])
                log(f"frac 2^-{fexp} tree-{method} beam={beam}: "
                    f"recall={rec:.4f} qps={NQ/dt:.0f}")
    log("done")


if __name__ == "__main__":
    main()

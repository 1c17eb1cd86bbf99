"""Full filter-fraction landscape at 200k (reference protocol: fractions
2^0..2^-16, k=10), one row per (fraction, method) in the reference CSV
schema. Uses the cached bench indices.

Flat postfiltering is skipped below 2^-6: its doubling loop degenerates
there AND its beam-2560+ kernels can crash the TPU worker (kernel fault) —
exactly the regime the trees exist for. Resume a crashed sweep with
LANDSCAPE_START=<i> (appends to the existing CSV).

Run: nohup setsid python tools/landscape_200k.py > /tmp/landscape.log 2>&1 &
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
    BuildParams, RangeFilterTreeIndex, SuperOptimizedPostfilterTree,
    build_query_params)
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

N, D, K, NQ = 200_000, 128, 10, 2048
OUT = "results/landscape_200k.csv"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    points = (centers[rng.integers(0, 1000, N)]
              + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)

    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    post = PostfilterVamanaIndex(points, labels, bp)
    tree = RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                                build_params=bp)
    sup = SuperOptimizedPostfilterTree(
        points, labels, cutoff=1000, split_factor=2.0, shift_factor=0.5,
        build_params=bp)

    os.makedirs("results", exist_ok=True)
    rows = ["filter_width,method,recall,average_time,qps,threads"]
    if os.environ.get("LANDSCAPE_START") and os.path.exists(OUT):
        rows = open(OUT).read().strip().split("\n")
    qp10 = build_query_params(K, K)

    start_i = int(os.environ.get("LANDSCAPE_START", 0))
    for i in range(start_i, 17):
        frac = 2.0 ** -i
        width = frac if frac < 1 else 1.0
        lo = rng.uniform(0, 1 - width, NQ) if width < 1 else np.zeros(NQ)
        filters = np.stack([lo, lo + width], 1)

        ids_gt, d_gt = pre.batch_search(queries, filters, NQ, qp10)
        fmax = np.finfo(np.float32).max
        # pad slots carry dist FLT_MAX (the id pad value is method-specific
        # and id 0 is a legal point) — windows narrower than k make them
        # common at tiny fractions, and recall is over the TRUE result count
        gt_sets = [
            set(ids_gt[q][d_gt[q] < fmax].astype(np.int64).tolist())
            for q in range(NQ)]

        def run(name, fn):
            fn()  # warm
            best = 1e9
            ids = d = None
            for _ in range(2):
                t0 = time.perf_counter()
                ids, d = fn()
                best = min(best, time.perf_counter() - t0)
            rec = np.mean([
                (len(gt_sets[q]
                     & set(ids[q][d[q] < fmax].astype(np.int64).tolist()))
                 / len(gt_sets[q])) if gt_sets[q] else 1.0
                for q in range(NQ)])  # empty window -> vacuously correct
            rows.append(f"2pow{-i},{name},{rec:.4f},{best/NQ:.8f},"
                        f"{NQ/best:.1f},1")
            log(f"2^-{i} {name}: recall={rec:.4f} qps={NQ/best:.0f}")

        run("prefiltering",
            lambda: pre.batch_search(queries, filters, NQ, qp10))
        qp = build_query_params(K, 80, final_beam_multiply=2)
        if i <= 6:
            # below 2^-6 the doubling loop degenerates (34 QPS at 2^-7) and
            # its beam-2560+ kernels can crash the TPU worker (kernel fault)
            run("postfiltering_80_2",
                lambda: post.batch_search(queries, filters, NQ, qp))
        qp40 = build_query_params(K, 40, final_beam_multiply=2)
        run("vamana-tree_40", lambda: tree.batch_search(
            queries, filters, NQ, "fenwick", qp40))
        run("three-split_40", lambda: tree.batch_search(
            queries, filters, NQ, "three_split", qp40))
        run("optimized-postfiltering_40", lambda: tree.batch_search(
            queries, filters, NQ, "optimized_postfilter", qp40))
        run("super-postfiltering_40",
            lambda: sup.batch_search(queries, filters, NQ, qp40))
        with open(OUT, "w") as f:
            f.write("\n".join(rows) + "\n")
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()

"""Adversarial stress run (BASELINE config #5): 1M points in 100 gaussian
clusters on the sphere, labels correlated with cluster id, every query aimed
at one cluster's vectors but a DIFFERENT cluster's label window — the worst
case for naive postfiltering (the beam wanders the query's own cluster whose
points all fail the filter). The tree methods must hold recall; naive
postfiltering is expected to degrade or hit its beam cap.

Mirrors the reference's generator semantics
(ref: generate_advserial_dataset.py:8-60) via experiments/datasets.py and
reports recall/QPS for prefilter, flat postfilter, and B-WST methods.

Run: nohup setsid python tools/adversarial_1m.py > /tmp/adv1m.log 2>&1 &
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

from rangefilteredann_tpu import (BuildParams, RangeFilterTreeIndex,
                                  build_query_params)
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

N, NC, D, K, NQ = 1_000_000, 100, 100, 10, 2048


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(NC, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    per = N // NC
    data = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(size=(N, D))
    data = (data / np.linalg.norm(data, axis=1, keepdims=True)).astype(np.float32)
    labels = (np.repeat(np.arange(NC), per) + rng.uniform(size=N)).astype(np.float64)
    qc = rng.integers(0, NC, size=NQ)
    queries = centers[qc] + 0.05 * rng.normal(size=(NQ, D))
    queries = (queries / np.linalg.norm(queries, axis=1, keepdims=True)).astype(np.float32)
    target = (qc + 1) % NC
    filters = np.stack([target.astype(np.float64), target + 1.0], axis=1)

    rows = ["filter_width,method,recall,average_time,qps,threads"]

    def csv(method, rec, dt):
        rows.append(f"cluster-1,{method},{rec:.4f},{dt/NQ:.8f},{NQ/dt:.1f},1")
        with open("results/adversarial_1m.csv", "w") as f:
            f.write("\n".join(rows) + "\n")

    pre = PrefilterIndex(data, labels, metric="mips")
    qp10 = build_query_params(K, K)
    ids_gt, _ = pre.batch_search(queries, filters, NQ, qp10)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        pre.batch_search(queries, filters, NQ, qp10)
        best = min(best, time.perf_counter() - t0)
    log(f"adversarial prefilter exact: {NQ/best:.0f} qps")
    csv("prefiltering", 1.0, best)
    gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]

    def rec_of(ids):
        return float(np.mean([
            len(gt_sets[i] & set(ids[i].astype(np.int64).tolist())) / K
            for i in range(NQ)]))

    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/adv/")
    t0 = time.time()
    flat = PostfilterVamanaIndex(data, labels, bp, metric="mips")
    log(f"flat build/load: {(time.time()-t0)/60:.1f} min")
    for beam in (80, 320):
        qp = build_query_params(K, beam, final_beam_multiply=2)
        flat.batch_search(queries, filters, NQ, qp)
        t0 = time.perf_counter()
        ids, _ = flat.batch_search(queries, filters, NQ, qp)
        dt = time.perf_counter() - t0
        log(f"adversarial naive-postfilter beam={beam}: "
            f"recall={rec_of(ids):.4f} qps={NQ/dt:.0f}")
        csv(f"postfiltering_{beam}_2", rec_of(ids), dt)
    # free the flat graph (+ any inline) before the 11 tree rows load
    del flat

    t0 = time.time()
    tree = RangeFilterTreeIndex(data, labels, cutoff=1000, split_factor=2,
                                build_params=bp, metric="mips")
    log(f"tree build/load: {(time.time()-t0)/60:.1f} min")
    tags = {"fenwick": "vamana-tree",
            "optimized_postfilter": "optimized-postfiltering",
            "three_split": "three-split"}
    for method in ("fenwick", "optimized_postfilter", "three_split"):
        qp40 = build_query_params(K, 40, final_beam_multiply=2)
        tree.batch_search(queries, filters, NQ, method, qp40)
        t0 = time.perf_counter()
        ids, _ = tree.batch_search(queries, filters, NQ, method, qp40)
        dt = time.perf_counter() - t0
        log(f"adversarial tree-{method} beam=40: recall={rec_of(ids):.4f} "
            f"qps={NQ/dt:.0f}")
        csv(f"{tags[method]}_40_2", rec_of(ids), dt)
    log("adversarial_1m done -> results/adversarial_1m.csv")


if __name__ == "__main__":
    main()

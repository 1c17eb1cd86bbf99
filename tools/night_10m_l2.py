"""DEEP-10M-class demo, take 2: L2 on the unit sphere.

The first 10M graph demo searched with MIPS and recorded recall 0.35/0.52 at
beam 80/160 (results/scale_demos_r2.log): MIPS beam search disables cut
pruning (reference semantics, ops/beam_search.py) and is beam-hungry. But the
demo's points are unit-normalized — exactly DEEP's angular regime — and on
the sphere L2 ranks identically to inner product (||q-x||^2 = 2 - 2*ip up to
the query-norm constant), so the TPU-native move is to build + search the
graph in L2 and keep cut pruning. Same generator (seed 23, bit-identical
stream via tools/night_10m.make_data), fresh graph cache dir (cache names
don't encode the metric).

Stages (each logged incrementally to results/scale_demos_r2.log):
  1. exact-prefilter GT at 2^-2 / 2^-6 (L2 == MIPS GT on normalized data),
  2. flat L2 graph R=48/L=100 (~163 min build at 10M on the chain's record),
     doubling-postfilter beam sweep,
  3. 2-row B-WST (cutoff 5M, row 0 shared with the flat cache) with lazy
     per-row device residency; fenwick eval at both fractions.

Run: nohup setsid python tools/night_10m_l2.py > /tmp/night10m_l2.log 2>&1 &
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from night_10m import make_data  # noqa: E402  (seed-23 generator + cache)

RESULTS = "results/scale_demos_r2.log"
CACHE = "bench_cache/deep10m_l2/"
N, D, K, NQ = 10_000_000, 96, 10, 2048


def log(*a):
    line = f"[{time.strftime('%H:%M:%S')}] " + " ".join(str(x) for x in a)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def recall(ids, gt_sets):
    return float(np.mean(
        [len(gt_sets[i] & set(ids[i].astype(np.int64).tolist())) / K
         for i in range(NQ)]))


def main():
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex
    from rangefilteredann_tpu.models.range_filter_tree import (
        RangeFilterTreeIndex)

    log("night10mL2: loading 10M points (seed 23)...")
    points, labels, queries, f2, f6 = make_data()
    filt = {2: f2, 6: f6}

    pre = PrefilterIndex(points, labels, metric="l2")
    qp10 = build_query_params(K, K)
    gt = {}
    for fexp in (2, 6):
        ids_gt, _ = pre.batch_search(queries, filt[fexp], NQ, qp10)
        gt[fexp] = [set(r.astype(np.int64).tolist()) for r in ids_gt]
    log("night10mL2: GT done (exact L2 prefilter)")
    del pre
    gc.collect()

    # --- flat L2 graph + doubling-postfilter beam sweep ---
    t0 = time.time()
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=48, L=100, alpha=1.2, cache_path=CACHE),
        metric="l2")
    log(f"night10mL2: flat graph build/load: {(time.time()-t0)/60:.1f} min")
    for fexp, beams in ((2, (20, 40, 80, 160)), (6, (40, 80))):
        for beam in beams:
            qp = build_query_params(K, beam, final_beam_multiply=2)
            idx.batch_search(queries, filt[fexp], NQ, qp)
            t0 = time.perf_counter()
            ids, _ = idx.batch_search(queries, filt[fexp], NQ, qp)
            dt = time.perf_counter() - t0
            log(f"night10mL2: 2^-{fexp} flat beam={beam} fm=2: "
                f"recall={recall(ids, gt[fexp]):.4f} qps={NQ/dt:.0f}")
    del idx
    gc.collect()

    # --- 2-row B-WST with lazy residency; fenwick at both fractions ---
    t0 = time.time()
    tree = RangeFilterTreeIndex(
        points, labels, cutoff=5_000_000, split_factor=2,
        build_params=BuildParams(R=48, L=100, alpha=1.2, cache_path=CACHE),
        metric="l2", device_rows_budget=4 << 30)
    log(f"night10mL2: 2-row B-WST build/load: {(time.time()-t0)/60:.1f} min")
    for fexp in (2, 6):
        for beam in (40, 80):
            qp = build_query_params(K, beam, final_beam_multiply=2)
            tree.batch_search(queries, filt[fexp], NQ, "fenwick", qp)
            t0 = time.perf_counter()
            ids, _ = tree.batch_search(queries, filt[fexp], NQ, "fenwick", qp)
            dt = time.perf_counter() - t0
            log(f"night10mL2: 2^-{fexp} fenwick beam={beam}: "
                f"recall={recall(ids, gt[fexp]):.4f} qps={NQ/dt:.0f}")
    log("night10mL2 done")


if __name__ == "__main__":
    main()

"""10M night runner (one process):

  1. regenerate the demo_10m dataset (seed 23, identical stream),
  2. exact-prefilter GT at 2^-2 and 2^-6,
  3. flat-graph (cached R=48/L=100 MIPS) beam sweep 160..1280 — the chain's
     beam 80/160 eval showed 0.35/0.52 recall: MIPS search is beam-hungry
     (docs/PERFORMANCE.md), so record where the build's recall ceiling is,
  4. 2-row B-WST (cutoff 5M; row 0 shared with the flat cache) with lazy
     row residency; fenwick eval at both fractions (the tree's regime).

Appends to results/scale_demos_r2.log (committed record).
Run: nohup setsid python tools/night_10m.py > /tmp/night10m.log 2>&1 &
"""

import gc
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

RESULTS = "results/scale_demos_r2.log"
N, D, K, NQ = 10_000_000, 96, 10, 2048


def log(*a):
    line = f"[{time.strftime('%H:%M:%S')}] " + " ".join(str(x) for x in a)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


CACHE_DIR = "/tmp/night10m_data"


def make_data(write_cache=False):
    """Bit-identical replica of tools/demo_10m.py's generator (seed 23).
    The point/label stream must match exactly (graph cache fingerprints);
    filters only need self-consistency. A CPU-only pre-run can cache the
    arrays so the TPU-holding process skips the ~25 min generation."""
    names = ("points", "labels", "queries", "filters2", "filters6")
    if not write_cache and all(
            os.path.exists(f"{CACHE_DIR}/{n}.npy") for n in names):
        out = [np.load(f"{CACHE_DIR}/{n}.npy", mmap_mode=None) for n in names]
        return out
    rng = np.random.default_rng(23)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    points = np.empty((N, D), dtype=np.float32)
    for lo in range(0, N, 1_000_000):
        hi = lo + 1_000_000
        a = rng.integers(0, 1000, hi - lo)
        points[lo:hi] = centers[a] + 1.0 * rng.normal(
            size=(hi - lo, D)).astype(np.float32)
    points /= np.linalg.norm(points, axis=1, keepdims=True)
    labels = rng.uniform(size=N)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + 1.0 * rng.normal(size=(NQ, D))).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    filts = {}
    for fexp in (2, 6):
        frac = 2.0 ** -fexp
        lo = rng.uniform(0, 1 - frac, NQ)
        filts[fexp] = np.stack([lo, lo + frac], 1)
    if write_cache:
        os.makedirs(CACHE_DIR, exist_ok=True)
        for n, arr in zip(names,
                          (points, labels, queries, filts[2], filts[6])):
            np.save(f"{CACHE_DIR}/{n}.npy", arr)
    return [points, labels, queries, filts[2], filts[6]]


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

    log("night10m: loading/generating 10M points (seed 23)...")
    points, labels, queries, f2, f6 = make_data()
    filt = {2: f2, 6: f6}

    pre = PrefilterIndex(points, labels, metric="mips")
    qp10 = build_query_params(K, K)
    gt = {}
    for fexp in (2, 6):
        ids_gt, _ = pre.batch_search(queries, filt[fexp], NQ, qp10)
        gt[fexp] = [set(r.astype(np.int64).tolist()) for r in ids_gt]
    del pre
    gc.collect()

    # --- flat graph beam sweep (cache hit: built by the afternoon chain) ---
    t0 = time.time()
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/"),
        metric="mips")
    log(f"night10m: flat graph load: {(time.time()-t0)/60:.1f} min")
    for beam in (320, 640, 1280):
        qp = build_query_params(K, beam, final_beam_multiply=2)
        idx.batch_search(queries, filt[2], NQ, qp)
        t0 = time.perf_counter()
        ids, _ = idx.batch_search(queries, filt[2], NQ, qp)
        dt = time.perf_counter() - t0
        log(f"night10m: 2^-2 flat beam={beam} fm=2: "
            f"recall={recall(ids, gt[2]):.4f} qps={NQ/dt:.0f}")
    del idx
    gc.collect()

    # --- 2-row B-WST with lazy residency; fenwick at both fractions ---
    t0 = time.time()
    tree = RangeFilterTreeIndex(
        points, labels, cutoff=5_000_000, split_factor=2,
        build_params=BuildParams(R=48, L=100, alpha=1.2,
                                 cache_path="bench_cache/"),
        metric="mips", device_rows_budget=4 << 30)
    log(f"night10m: 2-row B-WST build/load: {(time.time()-t0)/60:.1f} min")
    for fexp in (2, 6):
        for beam in (80, 160):
            qp = build_query_params(K, beam, final_beam_multiply=2)
            tree.batch_search(queries, filt[fexp], NQ, "fenwick", qp)
            t0 = time.perf_counter()
            ids, _ = tree.batch_search(queries, filt[fexp], NQ, "fenwick", qp)
            dt = time.perf_counter() - t0
            log(f"night10m: 2^-{fexp} fenwick beam={beam}: "
                f"recall={recall(ids, gt[fexp]):.4f} qps={NQ/dt:.0f}")
    log("night10m done")


if __name__ == "__main__":
    main()

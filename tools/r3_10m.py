"""Round-3 DEEP-10M runner (VERDICT item 1): graph methods at 10M with
recall >= 0.9 at 2^-2 / 2^-6, exercising the lazy row-residency path.

Stages (each independent; all results append to results/scale_demos_r3.log):
  1. load the seed-23 10M L2-on-sphere dataset (cached under
     /tmp/night10m_data by tools/night_10m.make_data) + GT (cached npy).
  2. flat R=48/L=100 L2 graph (cache hit: bench_cache/deep10m_l2, built in
     round 2's night run, 132.7 min): finish the beam sweep the round
     boundary cut — beams 320/640 at 2^-2, 160/320 at 2^-6.
  3. B-WST cutoff=2.5M split=2 (rows: 10M / 2x5M / 4x2.5M; row 0 shared
     with the flat cache) under device_rows_budget — optimized_postfilter /
     three_split / fenwick eval at both fractions. The tree's 5M/2.5M
     buckets double the in-range density vs the flat graph, which is the
     recall lever at fixed build quality (L=100).

Smoke test: RFANN_SMOKE=1 runs the same code at 50k/cutoff=12k on CPU.
Run: nohup setsid python tools/r3_10m.py > /tmp/r3_10m.log 2>&1 &
"""

import gc
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SMOKE = bool(os.environ.get("RFANN_SMOKE"))
RESULTS = "results/scale_demos_r3.log" if not SMOKE else "/tmp/smoke_r3.log"
CACHE = "bench_cache/deep10m_l2/" if not SMOKE else "/tmp/smoke_cache/"
K, NQ = 10, (2048 if not os.environ.get("RFANN_SMOKE") else 512)
N, D = (10_000_000, 96) if not SMOKE else (16_000, 96)
CUTOFF = 2_500_000 if not SMOKE else 4_000
DATA_DIR = "/tmp/night10m_data"


def log(*a):
    line = f"[{time.strftime('%H:%M:%S')}] " + " ".join(str(x) for x in a)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def recall(ids, gt_sets):
    return float(np.mean(
        [len(gt_sets[i] & set(ids[i].astype(np.int64).tolist()))
         / max(1, len(gt_sets[i])) for i in range(NQ)]))


def get_data():
    if SMOKE:
        rng = np.random.default_rng(23)
        centers = rng.normal(size=(100, D)).astype(np.float32)
        pts = (centers[rng.integers(0, 100, N)]
               + rng.normal(size=(N, D)).astype(np.float32))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        labels = rng.uniform(size=N)
        qs = (centers[rng.integers(0, 100, NQ)]
              + rng.normal(size=(NQ, D)).astype(np.float32))
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        filts = {}
        for fexp in (2, 6):
            frac = 2.0 ** -fexp
            lo = rng.uniform(0, 1 - frac, NQ)
            filts[fexp] = np.stack([lo, lo + frac], 1)
        return pts, labels, qs, filts[2], filts[6]
    from night_10m import make_data

    return make_data()


def main():
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex
    from rangefilteredann_tpu.models.range_filter_tree import (
        RangeFilterTreeIndex)

    log(f"r3_10m: loading {N} points (seed 23)...")
    points, labels, queries, f2, f6 = get_data()
    filt = {2: f2, 6: f6}

    # --- stage 1: GT (cached npy after the first run) ---
    gt = {}
    gt_files = {f: f"{DATA_DIR}/gt{f}_ids.npy" for f in (2, 6)}
    if not SMOKE and all(os.path.exists(p) for p in gt_files.values()):
        for fexp in (2, 6):
            ids_gt = np.load(gt_files[fexp])
            gt[fexp] = [set(r.astype(np.int64).tolist()) for r in ids_gt]
        log("r3_10m: GT loaded from cache")
        pre_qps = None
    else:
        pre = PrefilterIndex(points, labels, metric="l2")
        qp10 = build_query_params(K, K)
        for fexp in (2, 6):
            t0 = time.perf_counter()
            ids_gt, _ = pre.batch_search(queries, filt[fexp], NQ, qp10)
            dt = time.perf_counter() - t0
            log(f"r3_10m: GT 2^-{fexp} exact prefilter qps={NQ/dt:.0f}")
            gt[fexp] = [set(r.astype(np.int64).tolist()) for r in ids_gt]
            if not SMOKE:
                os.makedirs(DATA_DIR, exist_ok=True)
                np.save(gt_files[fexp], ids_gt)
        del pre
        gc.collect()
        log("r3_10m: GT done")

    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path=CACHE)

    # --- stage 2: flat graph, finish the beam sweep ---
    try:
        if SMOKE:
            raise RuntimeError("smoke: skip stage 2 (path covered by tests)")
        t0 = time.time()
        idx = PostfilterVamanaIndex(points, labels, bp, metric="l2")
        log(f"r3_10m: flat graph build/load: {(time.time()-t0)/60:.1f} min")
        for fexp, beams in ((2, (320, 640)), (6, (160, 320))):
            for beam in beams:
                qp = build_query_params(K, beam, final_beam_multiply=2)
                idx.batch_search(queries, filt[fexp], NQ, qp)
                t0 = time.perf_counter()
                ids, _ = idx.batch_search(queries, filt[fexp], NQ, qp)
                dt = time.perf_counter() - t0
                log(f"r3_10m: 2^-{fexp} flat beam={beam} fm=2: "
                    f"recall={recall(ids, gt[fexp]):.4f} qps={NQ/dt:.0f}")
        del idx
        gc.collect()
    except Exception:
        log(f"r3_10m stage 2 FAILED\n{traceback.format_exc()}")

    # --- stage 3: 3-row B-WST with lazy residency ---
    try:
        t0 = time.time()
        tree = RangeFilterTreeIndex(
            points, labels, cutoff=CUTOFF, split_factor=2,
            build_params=bp, metric="l2",
            device_rows_budget=(6 << 30) if not SMOKE else (64 << 20))
        log(f"r3_10m: B-WST cutoff={CUTOFF} build/load: "
            f"{(time.time()-t0)/60:.1f} min "
            f"(rows={len(tree._offsets)})")
        for method in ("optimized_postfilter", "three_split", "fenwick"):
            for fexp in (2, 6):
                for beam in (80, 160, 320):
                    qp = build_query_params(K, beam, final_beam_multiply=2)
                    tree.batch_search(queries, filt[fexp], NQ, method, qp)
                    t0 = time.perf_counter()
                    ids, _ = tree.batch_search(
                        queries, filt[fexp], NQ, method, qp)
                    dt = time.perf_counter() - t0
                    log(f"r3_10m: 2^-{fexp} {method} beam={beam}: "
                        f"recall={recall(ids, gt[fexp]):.4f} qps={NQ/dt:.0f}")
    except Exception:
        log(f"r3_10m stage 3 FAILED\n{traceback.format_exc()}")
    log("r3_10m done")


if __name__ == "__main__":
    main()

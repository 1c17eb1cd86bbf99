"""Round-5c runner: the adv1m tree build stalled in the degenerate-geometry
regime (row6+ buckets hold ~1 gaussian cluster — pairwise-distance variance
collapses and RobustPrune work explodes; rows 1-5 averaged 8 min, row6 ran
75+ min with zero progress). Killed; this runner salvages the adversarial
tree measurement from the 5 CACHED rows via a cutoff=31250 tree (row content
is cutoff-independent — caches copied to the 31250 names and load-verified
on CPU), then runs super1m and the driver-bench compile warm.

Run: nohup setsid env R5N_DEADLINE=<epoch> python tools/r5c_night.py \
         > /tmp/r5c_night.log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("RFANN_INLINE_BUDGET", "9.5e9")

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

DEADLINE = float(os.environ.get("R5N_DEADLINE", time.time() + 2 * 3600))
os.environ.setdefault("S1M_DEADLINE", str(DEADLINE))

from r3_night import scrub_device  # noqa: E402
from r5_night import phase_warm200k  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}] [{left_min():+.0f}m]", *a,
          flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def phase_adv_tree():
    """Adversarial tree methods on the cutoff=31250 tree (cached rows 1-5).

    Same data/query/GT streams as tools/adversarial_1m.py; window = one full
    cluster (1/100 of label space ~ fraction 2^-6.6). The deeper reference
    tree (cutoff=1000) is unbuildable on this data — the adversarial
    generator's point clusters are exactly the RobustPrune-degenerate case
    the round-3 postmortem documented — so the shallow tree (leaf 31250,
    windows route to leaf-graph searches + fringe scans) is the honest
    TPU-native configuration for this stress test.
    """
    from rangefilteredann_tpu import (BuildParams, RangeFilterTreeIndex,
                                      build_query_params)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    N, NC, D, K, NQ = 1_000_000, 100, 100, 10, 2048
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(NC, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    per = N // NC
    data = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(size=(N, D))
    data = (data / np.linalg.norm(data, axis=1, keepdims=True)).astype(
        np.float32)
    labels = (np.repeat(np.arange(NC), per)
              + rng.uniform(size=N)).astype(np.float64)
    qc = rng.integers(0, NC, size=NQ)
    queries = centers[qc] + 0.05 * rng.normal(size=(NQ, D))
    queries = (queries / np.linalg.norm(queries, axis=1, keepdims=True)
               ).astype(np.float32)
    target = (qc + 1) % NC
    filters = np.stack([target.astype(np.float64), target + 1.0], axis=1)

    pre = PrefilterIndex(data, labels, metric="mips")
    qp10 = build_query_params(K, K)
    ids_gt, _ = pre.batch_search(queries, filters, NQ, qp10)
    gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]
    del pre
    log("adv_tree: GT done")

    def rec_of(ids):
        return float(np.mean([
            len(gt_sets[i] & set(ids[i].astype(np.int64).tolist())) / K
            for i in range(NQ)]))

    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/adv/")
    tree = RangeFilterTreeIndex(data, labels, cutoff=31250, split_factor=2,
                                build_params=bp, metric="mips",
                                require_cache=True)
    log("adv_tree: 6-row tree loaded from cache")

    out = "results/adversarial_1m.csv"
    with open(out) as f:
        rows = [ln.rstrip("\n") for ln in f if ln.strip()]
    have = {tuple(ln.split(",")[:2]) for ln in rows[1:]}
    tags = {"fenwick": "vamana-tree-c31250",
            "optimized_postfilter": "optimized-postfiltering-c31250",
            "three_split": "three-split-c31250"}
    for method in ("fenwick", "optimized_postfilter", "three_split"):
        if left_min() < 3:
            break
        name = f"{tags[method]}_40_2"
        if ("cluster-1", name) in have:
            continue
        qp40 = build_query_params(K, 40, final_beam_multiply=2)
        tree.batch_search(queries, filters, NQ, method, qp40)
        t0 = time.perf_counter()
        ids, _ = tree.batch_search(queries, filters, NQ, method, qp40)
        dt = time.perf_counter() - t0
        rec = rec_of(ids)
        log(f"adv_tree {method}: recall={rec:.4f} qps={NQ/dt:.0f}")
        rows.append(f"cluster-1,{name},{rec:.4f},{dt/NQ:.8f},{NQ/dt:.1f},1")
        with open(out, "w") as f:
            f.write("\n".join(rows) + "\n")


def phase_super1m():
    import super1m

    super1m.main()


PHASES = [
    ("adv_tree", phase_adv_tree, 25),
    ("super1m", phase_super1m, 95),
    ("warm200k", phase_warm200k, 25),
]

if __name__ == "__main__":
    only = set(sys.argv[1:])
    log(f"r5c_night start; deadline in {left_min():.0f} min; "
        f"devices={jax.devices()}")
    for name, fn, est in PHASES:
        if only and name not in only:
            continue
        # super1m self-gates on S1M_DEADLINE and caches rows resumably, so
        # start it with ANY meaningful window; warm200k self-gates per shape
        gate = 5 if name in ("warm200k", "super1m") else est * 0.9
        if left_min() < gate:
            log(f"=== phase {name} SKIPPED ({left_min():.0f} min left < "
                f"{gate:.0f}) ===")
            continue
        for attempt in (1, 2):
            log(f"=== phase {name} (est {est} min, attempt {attempt}) ===")
            t0 = time.time()
            try:
                fn()
                log(f"=== phase {name} done in "
                    f"{(time.time()-t0)/60:.1f} min ===")
                break
            except Exception:
                tb = traceback.format_exc()
                log(f"=== phase {name} FAILED after "
                    f"{(time.time()-t0)/60:.1f} min ===\n{tb}")
                scrub_device()
                if "RESOURCE_EXHAUSTED" not in tb or attempt == 2:
                    break
        scrub_device()
    log("r5c_night done")

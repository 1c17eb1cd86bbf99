"""Protocol-scale demonstrations, one process (claim wedges cost minutes):

  1. DEEP-10M-scale demo (tools/demo_10m.py): exact prefilter QPS at 2^-2 /
     2^-6 + flat R=48 Vamana build + beam-doubling postfilter recall/QPS.
  2. RedCaps-scale 12M x 512d uint8 store smoke (tools/final_batch.py
     phase_12m_uint8): native-byte store + exact scans + HBM arithmetic
     showing an R=48 graph still fits (verdict item 5).
  3. (stretch, if >2.2h remain) 10M B-WST rows 0-1: a 2-row tree at 10M
     with lazy per-row device residency, fenwick query vs prefilter GT.

Every phase appends to results/scale_demos_r2.log (committed) so the record
survives the machine. Run:
    nohup setsid python tools/scale_demos.py [--deadline-min M] \
        > /tmp/scale_demos.log 2>&1 &
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = "results/scale_demos_r2.log"
T0 = time.time()


def log(*a):
    line = f"[{time.strftime('%H:%M:%S')}] " + " ".join(str(x) for x in a)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


class _Tee:
    """Mirror phase stdout prints (demo_10m/final_batch log via print) into
    the committed results file."""

    def __init__(self, stream):
        self.stream = stream

    def write(self, s):
        self.stream.write(s)
        if s.strip():
            with open(RESULTS, "a") as f:
                f.write(s if s.endswith("\n") else s + "\n")

    def flush(self):
        self.stream.flush()


def phase_10m_tree(deadline_ts):
    """10M 2-row B-WST (cutoff=5M keeps exactly rows [10M], [5M,5M]) with
    lazy row residency; fenwick recall vs exact prefilter GT at 2^-2."""
    import gc

    import numpy as np

    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex
    from rangefilteredann_tpu.models.range_filter_tree import RangeFilterTreeIndex

    N, D, K, NQ = 10_000_000, 96, 10, 2048
    rng = np.random.default_rng(23)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    log("tree10m: generating 10M points...")
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
    frac = 0.25
    lo = rng.uniform(0, 1 - frac, NQ)
    filters = np.stack([lo, lo + frac], 1)

    pre = PrefilterIndex(points, labels, metric="mips")
    ids_gt, _ = pre.batch_search(queries, filters, NQ, build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]
    del pre
    gc.collect()

    t0 = time.time()
    # row 0 loads from the shared whole-dataset cache the flat demo saved;
    # only row 1 (two 5M buckets in one slab) builds fresh.
    # Residency budget 4 GB: rows are ~1.9 GB each, so both fit, but the
    # LRU path is exercised end-to-end at 10M.
    tree = RangeFilterTreeIndex(
        points, labels, cutoff=5_000_000, split_factor=2,
        build_params=BuildParams(R=48, L=100, alpha=1.2,
                                 cache_path="bench_cache/"),
        metric="mips", device_rows_budget=4 << 30)
    log(f"tree10m: 2-row B-WST build/load: {(time.time()-t0)/60:.1f} min")
    for beam in (80, 160):
        if time.time() > deadline_ts:
            log("tree10m: deadline — skipping remaining beams")
            break
        qp = build_query_params(K, beam, final_beam_multiply=2)
        tree.batch_search(queries, filters, NQ, qp, query_method="fenwick")
        t0 = time.perf_counter()
        ids, _ = tree.batch_search(queries, filters, NQ, qp,
                                   query_method="fenwick")
        dt = time.perf_counter() - t0
        rec = np.mean([len(gt_sets[i] & set(ids[i].astype(np.int64).tolist()))
                       / K for i in range(NQ)])
        log(f"tree10m: 2^-2 fenwick beam={beam}: recall={rec:.4f} "
            f"qps={NQ/dt:.0f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-min", type=float, default=330.0,
                    help="total wall budget for this chain (minutes)")
    ap.add_argument("--skip", default="", help="comma-set of phases to skip")
    args = ap.parse_args()
    deadline_ts = T0 + args.deadline_min * 60.0
    skip = set(args.skip.split(",")) if args.skip else set()

    import demo_10m
    import final_batch

    sys.stdout = _Tee(sys.stdout)

    phases = [
        ("10m", demo_10m.main, 0.0),
        ("12m-uint8", final_batch.phase_12m_uint8, 0.0),
        # stretch: needs ~1 x 10M-row build (~1.6h) + GT scan
        ("10m-tree", lambda: phase_10m_tree(deadline_ts), 135.0),
    ]
    for name, fn, need_min in phases:
        left = (deadline_ts - time.time()) / 60.0
        if name in skip:
            log(f"=== {name} skipped (--skip) ===")
            continue
        if left < need_min:
            log(f"=== {name} skipped ({left:.0f} min left < {need_min:.0f}) ===")
            continue
        try:
            log(f"=== {name} ({left:.0f} min left) ===")
            fn()
        except Exception:
            log(f"{name} FAILED\n{traceback.format_exc()}")
    log("scale_demos done")


if __name__ == "__main__":
    main()

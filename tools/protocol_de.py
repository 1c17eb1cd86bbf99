"""Phases D and E of tools/protocol_1m.py in a fresh process (the combined
run OOM'd at compile before the insert-batch HBM guard existed). Phase E is
DEADLINE-AWARE: super rows build one at a time and the loop exits cleanly
when the deadline passes (each finished row is cached for the next round).

Run: nohup setsid python tools/protocol_de.py [deadline_epoch] > log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEADLINE = float(sys.argv[1]) if len(sys.argv) > 1 else time.time() + 6 * 3600

from protocol_1m import NQ, K, log, make_data  # noqa: E402  (configures jax)
import numpy as np  # noqa: E402

from rangefilteredann_tpu import BuildParams, build_query_params  # noqa: E402


def phase_d():
    from protocol_1m import phase_d as pd

    pd()


def phase_e_deadline():
    """Build 1M super rows one at a time until the deadline, then (if all
    rows are present) run the query demonstration."""
    from rangefilteredann_tpu.models.super_postfilter_tree import (
        SuperOptimizedPostfilterTree, super_row_layout)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    N, D = 1_000_000, 128
    rng, points, labels, queries = make_data(N, D, seed=7)
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    rows = super_row_layout(N, 1000, 2.0, 0.5)
    # constructing the tree builds/loads rows in order and caches each on
    # completion; the deadline check happens BETWEEN attempts by trying one
    # more row each time with a fresh (cheap, cache-hitting) constructor
    # restricted via monkey-patched row list
    import rangefilteredann_tpu.models.super_postfilter_tree as spt

    built = 0
    for upto in range(1, len(rows) + 1):
        if time.time() > DEADLINE:
            log(f"E: deadline hit after {built}/{len(rows)} rows")
            return
        orig = spt.super_row_layout
        spt.super_row_layout = lambda *a, **k: rows[:upto]
        try:
            t0 = time.time()
            SuperOptimizedPostfilterTree(
                points, labels, cutoff=1000, split_factor=2.0,
                shift_factor=0.5, build_params=bp)
            log(f"E: rows 0..{upto-1} ready ({(time.time()-t0)/60:.1f} min)")
            built = upto
        finally:
            spt.super_row_layout = orig
    # all rows cached: full tree + measurements
    sup = SuperOptimizedPostfilterTree(
        points, labels, cutoff=1000, split_factor=2.0, shift_factor=0.5,
        build_params=bp)
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    FMAX = np.float32(np.finfo(np.float32).max)
    qp40 = build_query_params(K, 40, final_beam_multiply=2)
    for i in (2, 6, 10):
        frac = 2.0 ** -i
        lo = rng.uniform(0, 1 - frac, NQ)
        filters = np.stack([lo, lo + frac], 1)
        ids_gt, d_gt = pre.batch_search(queries, filters, NQ,
                                        build_query_params(K, K))
        gt_sets = [set(ids_gt[q][d_gt[q] < FMAX].astype(np.int64).tolist())
                   for q in range(NQ)]
        sup.batch_search(queries, filters, NQ, qp40)
        t0 = time.perf_counter()
        ids, d = sup.batch_search(queries, filters, NQ, qp40)
        dt = time.perf_counter() - t0
        rec = np.mean([
            (len(gt_sets[q] & set(ids[q][d[q] < FMAX].astype(np.int64)
                                  .tolist())) / len(gt_sets[q]))
            if gt_sets[q] else 1.0 for q in range(NQ)])
        log(f"E: 1M super 2^-{i}: recall={rec:.4f} qps={NQ/dt:.0f}")


def phase_10m():
    import demo_10m

    demo_10m.main()


if __name__ == "__main__":
    for name, fn in (("D", phase_d), ("10M", phase_10m),
                     ("E", phase_e_deadline)):
        try:
            log(f"=== phase {name} (deadline "
                f"{time.strftime('%H:%M', time.localtime(DEADLINE))}) ===")
            fn()
        except Exception:
            log(f"phase {name} FAILED\n{traceback.format_exc()}")
    log("protocol_de done")

"""CPU-side launch/padding profile of the 200k tree families (VERDICT-r4
item 6: fenwick runs ~4x slower than flat postfilter at 200k — profile the
per-(row, beam) launch structure before optimizing it).

Replicates bench.py's exact 200k workload (rng stream, NQ=10240, fraction
2^-2), loads the cached B-WST rows, runs the NATIVE batch planner for each
tree method, and reports per-phase task structure:

  - single-shot: tasks per (row, beam) group, pow2 pad size, pad waste
  - doubling: tasks per row, per-round beam ladder population
  - bruteforce fringe: window-row totals
  - per-query amplification: mean tasks per query (the intrinsic work
    multiplier vs the flat postfilter's ONE search per query)

Pure host analysis — no beam search runs, safe alongside a TPU process.
Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
         python tools/r5_tree_plan_analysis.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rangefilteredann_tpu import BuildParams, build_query_params
from rangefilteredann_tpu.models.base import pad_batch
from rangefilteredann_tpu.models.range_filter_tree import RangeFilterTreeIndex
from rangefilteredann_tpu.utils.data import first_geq

N, D, NQ, K = 200_000, 128, 10240, 10
FRACTION = 2.0**-2


def make_200k():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(
        np.float32)
    labels = rng.uniform(size=N)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)
    starts = rng.uniform(0, 1 - FRACTION, size=NQ)
    filters = np.stack([starts, starts + FRACTION], axis=1)
    return points, labels, queries, filters


def main():
    points, labels, _, filters = make_200k()
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    tree = RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                                build_params=bp, require_cache=True)
    lo_idx = first_geq(tree._labels_sorted, filters[:, 0])
    hi_idx = first_geq(tree._labels_sorted, filters[:, 1])
    hi_incl = np.searchsorted(tree._labels_sorted, filters[:, 1],
                              side="right")

    for method in ("fenwick", "optimized_postfilter", "three_split"):
        for beam in (40, 80):
            qp = build_query_params(K, beam, final_beam_multiply=2)
            plan = tree._plan_batch_native(method, lo_idx, hi_idx, hi_incl,
                                           qp)
            if plan is None:
                print(f"{method}: native planner unavailable"); continue
            (s_qi, s_row, s_bkt, s_beam), (d_qi, d_row, d_bkt, d_wlo,
                                           d_whi), (b_qi, b_s, b_e) = plan
            print(f"\n=== {method} beam={beam} fm=2 (NQ={NQ}) ===")
            # single-shot groups = launches (3 device ops each: qgather,
            # search, rerank-or-not)
            groups = []
            for r in np.unique(s_row):
                for b in np.unique(s_beam[s_row == r]):
                    cnt = int(((s_row == r) & (s_beam == b)).sum())
                    groups.append((int(r), int(b), cnt, pad_batch(cnt)))
            real = sum(g[2] for g in groups)
            padded = sum(g[3] for g in groups)
            print(f"single-shot: {len(s_qi)} tasks, {len(groups)} launch "
                  f"groups, padded {padded} / real {real} rows "
                  f"(waste {padded / max(real, 1):.2f}x)")
            for r, b, cnt, tp in sorted(groups):
                size = int(tree._offsets[r][1] - tree._offsets[r][0]) \
                    if len(tree._offsets[r]) > 1 else 0
                print(f"  row {r} (bucket~{size}): beam {b:4d}  "
                      f"tasks {cnt:6d} -> pad {tp:6d}")
            # doubling groups: _run_doubling groups by row then runs a
            # per-round ladder; population shrinks as queries satisfy
            if len(d_qi):
                print(f"doubling: {len(d_qi)} tasks over rows "
                      f"{dict(zip(*np.unique(d_row, return_counts=True)))}")
                widths = (d_whi - d_wlo)
                print(f"  window rows: mean {widths.mean():.0f} "
                      f"max {widths.max()}")
            if len(b_qi):
                w = (b_e - b_s)
                print(f"bruteforce fringe: {len(b_qi)} tasks, "
                      f"rows mean {w.mean():.0f} max {w.max()} "
                      f"total {w.sum()}")
            # intrinsic amplification vs flat postfilter (1 search/query)
            n_parts = len(s_qi) + len(d_qi) + len(b_qi)
            print(f"amplification: {n_parts / NQ:.2f} result-parts/query "
                  f"({len(s_qi) / NQ:.2f} searches + {len(d_qi) / NQ:.2f} "
                  f"doubling + {len(b_qi) / NQ:.2f} scans)")


if __name__ == "__main__":
    main()

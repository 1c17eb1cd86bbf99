"""On-chip A/B of the tree-row int8 inline blocks + fused Pallas kernel
at bench.py's 200k configuration (cached rows): 2x2 grid of
RFANN_TREE_INLINE x RFANN_PALLAS_BEAM for fenwick / optimized_postfilter /
three_split / super at beam 40/80.

Run (chip free): python tools/exp_tree_inline.py > /tmp/exp_tree.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RFANN_INLINE_BUDGET", "9.5e9")

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rangefilteredann_tpu import (
    BuildParams, RangeFilterTreeIndex, SuperOptimizedPostfilterTree,
    build_query_params)
import rangefilteredann_tpu.ops.beam_search as bs
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

K, NQ = 10, 10240


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, 128)).astype(np.float32)
    assign = rng.integers(0, 1000, size=200_000)
    points = (centers[assign]
              + 0.35 * rng.normal(size=(200_000, 128))).astype(np.float32)
    labels = rng.uniform(size=200_000)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + 0.35 * rng.normal(size=(NQ, 128))).astype(np.float32)
    starts = rng.uniform(0, 0.75, size=NQ)
    filters = np.stack([starts, starts + 0.25], axis=1)
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    tree = RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                                build_params=bp, require_cache=True)
    sup = SuperOptimizedPostfilterTree(
        points, labels, cutoff=1000, split_factor=2.0, shift_factor=0.5,
        build_params=bp, require_cache=True)
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    gt_ids, _ = pre.batch_search(queries, filters, NQ,
                                 build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
    del pre

    def rec_of(ids):
        return float(np.mean([
            len(gt_sets[i] & set(ids[i].astype(np.int64).tolist())) / K
            for i in range(NQ)]))

    def run(fn):
        fn()
        best, out = 1e9, None
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return out, best

    for inline in ("0", "1"):
        os.environ["RFANN_TREE_INLINE"] = inline
        for pallas in (False, True):
            if inline == "0" and pallas:
                continue  # no inline -> kernel ineligible anyway
            bs.PALLAS_BEAM = pallas
            tag = f"inline={inline} pallas={int(pallas)}"
            for method in ("fenwick", "optimized_postfilter", "three_split"):
                for beam in (40, 80):
                    qp = build_query_params(K, beam, final_beam_multiply=2)
                    (ids, _), dt = run(
                        lambda m=method, qp=qp: tree.batch_search(
                            queries, filters, NQ, m, qp))
                    log(f"{tag} tree-{method} beam={beam}: "
                        f"recall={rec_of(ids):.4f} qps={NQ/dt:.0f}")
            for beam in (40, 80):
                qp = build_query_params(K, beam, final_beam_multiply=2)
                (ids, _), dt = run(lambda qp=qp: sup.batch_search(
                    queries, filters, NQ, qp))
                log(f"{tag} super beam={beam}: recall={rec_of(ids):.4f} "
                    f"qps={NQ/dt:.0f}")
    bs.PALLAS_BEAM = True
    os.environ["RFANN_TREE_INLINE"] = "1"
    log("exp_tree_inline done")


if __name__ == "__main__":
    main()

"""Round-5 cold-cache rebuild chain (machine reset wiped bench_cache/).

ONE TPU process, phases priority-ordered and deadline-gated (r3_night
pattern).  Rebuilds exactly what bench.py's 200k section needs, in order of
bench impact per minute:

  1. flat postfilter graph (~3.5 min)   -> postfilter family
  2. B-WST rows            (~34 min)    -> fenwick / opt-postfilter / three-split
  3. super rows            (~65 min)    -> super family (only if time allows)
  4. warm-query pass                    -> pre-populate .jax_cache for the
                                           driver's bench run (untimed warm-ups
                                           make cold compiles harmless for the
                                           numbers, this only bounds duration)

Data generation mirrors bench.py main() exactly (same seed/params) so cache
fingerprints match.  Run:
  nohup setsid env R5_DEADLINE=<epoch> python tools/r5_prebuild.py \
      > /tmp/r5_prebuild.log 2>&1 &
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
    BuildParams,
    RangeFilterTreeIndex,
    SuperOptimizedPostfilterTree,
    build_query_params,
)
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex

N = 200_000
D = 128
K = 10
NQ = 10240
FRACTION = 2.0**-2
CLUSTERS = 1000

DEADLINE = float(os.environ.get("R5_DEADLINE", time.time() + 50 * 60))


def remaining():
    return DEADLINE - time.time()


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}] [{remaining()/60:+.1f}m]", *a,
          flush=True)


def main():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(CLUSTERS, D)).astype(np.float32)
    assign = rng.integers(0, CLUSTERS, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    q_assign = rng.integers(0, CLUSTERS, size=NQ)
    queries = (centers[q_assign] + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)
    starts = rng.uniform(0, 1 - FRACTION, size=NQ)
    filters = np.stack([starts, starts + FRACTION], axis=1)

    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")

    t0 = time.time()
    idx = PostfilterVamanaIndex(points, labels, bp)
    log(f"postfilter graph: {time.time() - t0:.0f}s")

    tree = None
    if remaining() > 5 * 60:
        t0 = time.time()
        tree = RangeFilterTreeIndex(points, labels, cutoff=1000,
                                    split_factor=2, build_params=bp)
        log(f"B-WST rows: {time.time() - t0:.0f}s")
    else:
        log("SKIP B-WST rows (deadline)")

    if remaining() > 70 * 60:
        t0 = time.time()
        SuperOptimizedPostfilterTree(points, labels, cutoff=1000,
                                     split_factor=2.0, shift_factor=0.5,
                                     build_params=bp)
        log(f"super rows: {time.time() - t0:.0f}s")
    else:
        log("SKIP super rows (deadline; ~65 min cold)")

    # Warm pass: the exact query shapes bench.py times, most valuable first.
    # Each step is deadline-gated; compiles land in the shared .jax_cache.
    warm = []
    if tree is not None:
        for beam in (40, 80):
            qp = build_query_params(K, beam, final_beam_multiply=2)
            for method in ("fenwick", "optimized_postfilter", "three_split"):
                warm.append((f"tree-{method} beam={beam}",
                             lambda m=method, q=qp: tree.batch_search(
                                 queries, filters, NQ, m, q)))
    for fm in (2, 4):
        for beam in (40, 80, 160, 20, 10, 320):
            qp = build_query_params(K, beam, final_beam_multiply=fm)
            warm.append((f"postfilter beam={beam} fm={fm}",
                         lambda q=qp: idx.batch_search(queries, filters,
                                                       NQ, q)))
    for name, fn in warm:
        if remaining() < 3 * 60:
            log(f"deadline — stopping warm pass before {name}")
            break
        t0 = time.time()
        fn()
        log(f"warm {name}: {time.time() - t0:.1f}s")

    log("done")


if __name__ == "__main__":
    main()

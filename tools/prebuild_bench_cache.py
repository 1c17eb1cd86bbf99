"""Prebuild bench_cache/ for bench.py (postfilter graph + B-WST rows + super rows).

Mirrors bench.py's data generation exactly (same seed/params) so the cache
keys match.  Run on the TPU:
    nohup setsid python tools/prebuild_bench_cache.py > /tmp/prebuild.log 2>&1 &
Cold timings at N=200k: postfilter ~3.5 min, B-WST ~34 min, super ~65 min.
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
)
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex

N = 200_000
D = 128
CLUSTERS = 1000


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(CLUSTERS, D)).astype(np.float32)
    assign = rng.integers(0, CLUSTERS, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)

    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")

    t0 = time.time()
    PostfilterVamanaIndex(points, labels, bp)
    log(f"postfilter graph: {time.time() - t0:.0f}s")

    t0 = time.time()
    RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                         build_params=bp)
    log(f"B-WST rows: {time.time() - t0:.0f}s")

    t0 = time.time()
    SuperOptimizedPostfilterTree(points, labels, cutoff=1000, split_factor=2.0,
                                 shift_factor=0.5, build_params=bp)
    log(f"super rows: {time.time() - t0:.0f}s")
    log("done")


if __name__ == "__main__":
    main()

"""Build the 1M-point B-WST row caches (same data as tools/bench_1m.py).

Row caches land in bench_cache/ (wst_*_1000000_* files) and resume if
interrupted. Run:
    nohup setsid python tools/prebuild_1m_tree.py > /tmp/tree1m.log 2>&1 &
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

from rangefilteredann_tpu import BuildParams, RangeFilterTreeIndex

N = 1_000_000
D = 128
CLUSTERS = 1000


def main():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(CLUSTERS, D)).astype(np.float32)
    points = (centers[rng.integers(0, CLUSTERS, N)]
              + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    t0 = time.time()
    RangeFilterTreeIndex(
        points, labels, cutoff=1000, split_factor=2,
        build_params=BuildParams(R=48, L=100, alpha=1.2,
                                 cache_path="bench_cache/"))
    print(f"[{time.strftime('%H:%M:%S')}] 1M B-WST rows: "
          f"{time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()

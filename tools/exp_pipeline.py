"""Measure cross-batch pipelining of the exact prefilter over the tunnel.

Modes (200k x 128d, fraction 2^-2, 10240-query batches, k=10):
  sync-fresh : repeated batch_search, DISTINCT batches (upload every call)
  sync-hit   : repeated batch_search, SAME batch (device query cache hits)
  pipe-fresh : batch_search_many over distinct batches (uploads overlap
               kernels; one blocking fetch for the stream)
  pipe-hit   : batch_search_many over the warm batch repeated
Prints per-mode QPS. Also asserts pipelined results == per-batch results.
"""

import os
import sys
import time

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")
from rangefilteredann_tpu import build_query_params
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

N = 200_000
D = 128
K = 10
NQ = 10240
B = 5
FRACTION = 2.0**-2
CLUSTERS = 1000


def log(*a):
    print(*a, flush=True)


def main():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(CLUSTERS, D)).astype(np.float32)
    assign = rng.integers(0, CLUSTERS, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        qa = r.integers(0, CLUSTERS, size=NQ)
        qs = (centers[qa] + 0.35 * r.normal(size=(NQ, D))).astype(np.float32)
        st = r.uniform(0, 1 - FRACTION, size=NQ)
        return qs, np.stack([st, st + FRACTION], axis=1)

    batches = [make_batch(100 + i) for i in range(B)]
    warm_q, warm_f = make_batch(7)

    idx = PrefilterIndex(points, labels, metric="Euclidian")
    qp = build_query_params(K, K)

    t0 = time.time()
    ref_ids, ref_d = idx.batch_search(warm_q, warm_f, NQ, qp)
    log(f"warm-up (compile): {time.time() - t0:.1f}s")

    # correctness: pipelined output == per-batch output
    a_ids, a_d = idx.batch_search(batches[0][0], batches[0][1], NQ, qp)
    many = idx.batch_search_many(batches[:2], qp)
    assert np.array_equal(many[0][0], a_ids) and np.array_equal(many[0][1], a_d)
    log("pipelined == per-batch: OK")

    for trial in range(2):
        # sync-fresh: distinct batches, one call each (cache misses: the
        # cache keeps max 8 entries; B=5 distinct fills it, so re-runs hit.
        # Use fresh seeds per trial to stay in miss territory.)
        fresh = [make_batch(1000 + 100 * trial + i) for i in range(B)]
        t0 = time.time()
        for q, f in fresh:
            idx.batch_search(q, f, NQ, qp)
        dt = time.time() - t0
        log(f"[{trial}] sync-fresh: {B*NQ/dt:.0f} qps ({1e3*dt/B:.0f} ms/batch)")

        # sync-hit: same warm batch repeatedly
        t0 = time.time()
        for _ in range(B):
            idx.batch_search(warm_q, warm_f, NQ, qp)
        dt = time.time() - t0
        log(f"[{trial}] sync-hit : {B*NQ/dt:.0f} qps ({1e3*dt/B:.0f} ms/batch)")

        # pipe-fresh
        fresh = [make_batch(5000 + 100 * trial + i) for i in range(B)]
        t0 = time.time()
        idx.batch_search_many(fresh, qp)
        dt = time.time() - t0
        log(f"[{trial}] pipe-fresh: {B*NQ/dt:.0f} qps ({1e3*dt/B:.0f} ms/batch)")

        # pipe-hit
        t0 = time.time()
        idx.batch_search_many([(warm_q, warm_f)] * B, qp)
        dt = time.time() - t0
        log(f"[{trial}] pipe-hit : {B*NQ/dt:.0f} qps ({1e3*dt/B:.0f} ms/batch)")
    log("done")


if __name__ == "__main__":
    main()

"""Where does the warm-cache e2e prefilter batch spend its 137 ms?

bench.py's e2e number (74.8k QPS at 10240 queries) runs with a warm device
query cache (same batch each rep), so upload is NOT the cost — yet the
device-resident rate says the kernels take only ~19 ms per 10240-query
launch. This harness splits one warm batch_search into phases and sweeps
SCAN_CHUNK to find the residual:

  host-prep   pad_queries + first_geq + _qkey + planning
  enqueue     launch_range_bruteforce returns (all dispatch enqueued)
  device      block_until_ready on the last future
  fetch+post  finish_range_bruteforce (device_get + scatter + finalize)

Run (TPU): python tools/exp_e2e.py
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

N, D, K, NQ = 200_000, 128, 10, 10240
FRACTION = 2.0 ** -2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from rangefilteredann_tpu.models import base
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex
    from rangefilteredann_tpu import build_query_params
    from rangefilteredann_tpu.utils.data import pad_queries

    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    q_assign = rng.integers(0, 1000, size=NQ)
    queries = (centers[q_assign] + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)
    starts = rng.uniform(0, 1 - FRACTION, size=NQ)
    filters = np.stack([starts, starts + FRACTION], axis=1)
    qp = build_query_params(K, K)

    idx = PrefilterIndex(points, labels, metric="Euclidian")
    idx.batch_search(queries, filters, NQ, qp)  # warm: compile + fill qcache

    def best_of(fn, reps=7):
        fn()
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # --- host-prep pieces ---
    dt = best_of(lambda: pad_queries(queries, D, idx._ps.d_pad))
    log(f"pad_queries: {dt*1e3:.1f} ms")
    qpad = pad_queries(queries, D, idx._ps.d_pad)
    dt = best_of(lambda: base._qkey(qpad))
    log(f"_qkey: {dt*1e3:.1f} ms")

    # --- e2e + phase split at each SCAN_CHUNK ---
    from rangefilteredann_tpu.utils.data import first_geq
    labels_sorted = idx._labels_sorted
    ss = first_geq(labels_sorted, filters[:, 0]).astype(np.int64)
    ee = first_geq(labels_sorted, filters[:, 1]).astype(np.int64)
    ps = idx._ps
    nc = ps.norm_col if ps.norm_col >= 0 else None

    for chunk in (2560, 5120, 10240):
        base.SCAN_CHUNK = chunk

        dt = best_of(lambda: idx.batch_search(queries, filters, NQ, qp))
        log(f"SCAN_CHUNK={chunk}: e2e {dt*1e3:.1f} ms -> {NQ/dt:.0f} qps")

        def enqueue():
            return base.launch_range_bruteforce(
                ps.data, ps.norms_sq, qpad, ss, ee, K, ps.metric, norm_col=nc)

        dt = best_of(lambda: enqueue() and None)
        log(f"  enqueue-only: {dt*1e3:.1f} ms")

        def through_device():
            launch = enqueue()
            launch[0][-1][1].block_until_ready()

        dt = best_of(through_device)
        log(f"  enqueue+device: {dt*1e3:.1f} ms")

        def full():
            base.finish_range_bruteforce(enqueue())

        dt = best_of(full)
        log(f"  launch+finish: {dt*1e3:.1f} ms")
    base.SCAN_CHUNK = 5120


if __name__ == "__main__":
    main()

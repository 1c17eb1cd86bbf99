"""Round-3 e2e transfer-schedule A/B (VERDICT #3): can sub-launch splits +
async fetches beat the production one-combined-fetch schedule on a warm
10240-query prefilter batch?

Schedules measured at 200k / fraction 2^-2 / 10240 queries, warm qcache
(bench.py's regime — upload is cached, so this isolates kernel+fetch+host):

  prod@C      production batch_search at SCAN_CHUNK=C (launch all, ONE
              combined device_get at the end)
  eager@C     launch all chunks, then device_get each chunk AS ITS OWN
              round trip in launch order (fetch i overlaps kernel i+1..)
  async@C     launch all chunks, issue copy_to_host_async on every packed
              result immediately, then one combined device_get
  hostpost    the numpy scatter/unpack/finalize cost alone (host tail)

Run (TPU): python tools/exp_overlap.py
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
    print(*a, flush=True)


def best_of(fn, reps=7):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from rangefilteredann_tpu import build_query_params
    from rangefilteredann_tpu.models import base
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex
    from rangefilteredann_tpu.utils.data import first_geq, pad_queries

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
    qp = build_query_params(K, K)

    idx = PrefilterIndex(points, labels, metric="Euclidian")
    ps = idx._ps
    nc = ps.norm_col if ps.norm_col >= 0 else None
    labels_sorted = idx._labels_sorted
    ss = first_geq(labels_sorted, filters[:, 0]).astype(np.int64)
    ee = first_geq(labels_sorted, filters[:, 1]).astype(np.int64)
    qpad = pad_queries(queries, D, ps.d_pad)
    idx.batch_search(queries, filters, NQ, qp)  # warm: compiles + qcache

    def launch():
        return base.launch_range_bruteforce(
            ps.data, ps.norms_sq, qpad, ss, ee, K, ps.metric, norm_col=nc)

    for chunk in (2560, 5120, 10240):
        base.SCAN_CHUNK = chunk
        idx.batch_search(queries, filters, NQ, qp)  # compile this shape

        dt = best_of(lambda: idx.batch_search(queries, filters, NQ, qp))
        log(f"prod@{chunk}: {dt*1e3:.1f} ms -> {NQ/dt:.0f} qps")

        def eager():
            futures, out_d, out_i, k, *_ = launch()
            for ch, packed in futures:
                arr = jax.device_get(packed)
                d, i = base._unpack_di(arr, k)
                out_d[ch] = d[: len(ch)]
                out_i[ch] = i[: len(ch)]
            return out_d, out_i

        dt = best_of(eager)
        log(f"eager@{chunk}: {dt*1e3:.1f} ms -> {NQ/dt:.0f} qps")

        def async_fetch():
            rec = launch()
            for _, packed in rec[0]:
                packed.copy_to_host_async()
            return base.finish_range_bruteforce(rec)

        dt = best_of(async_fetch)
        log(f"async@{chunk}: {dt*1e3:.1f} ms -> {NQ/dt:.0f} qps")
    base.SCAN_CHUNK = 5120

    # host tail alone: run the finish-phase numpy work on pre-fetched data
    rec = launch()
    flat = jax.device_get([p for _, p in rec[0]])
    futures, out_d, out_i, k, fill_key, _ = rec

    def hostpost():
        for (ch, _), arr in zip(futures, flat):
            d, i = base._unpack_di(arr, k)
            out_d[ch] = d[: len(ch)]
            out_i[ch] = i[: len(ch)]

    dt = best_of(hostpost)
    log(f"hostpost (scatter+unpack): {dt*1e3:.1f} ms")

    # full batch_search host wrapper tail: everything batch_search does
    # before launch (plan) and after finish (finalize)
    t0 = time.perf_counter()
    for _ in range(5):
        idx.batch_search(queries, filters, NQ, qp)
    log(f"prod steady (5 reps avg): {(time.perf_counter()-t0)/5*1e3:.1f} ms")


if __name__ == "__main__":
    main()

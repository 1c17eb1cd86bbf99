"""A/B the fused Pallas beam kernel (ops/pallas_beam.py) vs the XLA path
on the real chip, at bench.py's exact 200k protocol configuration (cached
graph) and optionally the 1M int8-inline config.

Run (chip must be free):
    python tools/exp_pallas_beam.py [1m] > /tmp/exp_pallas_beam.log 2>&1

Prints per-beam QPS + recall for both kernels and a PASS/FAIL parity line;
use it to decide the RFANN_PALLAS_BEAM default.
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

from rangefilteredann_tpu import BuildParams, build_query_params
import rangefilteredann_tpu.ops.beam_search as bs
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

K = 10


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def ab(idx, queries, filters, nq, gt_sets, beams, fms=(2,)):
    for beam in beams:
        for fm in fms:
            qp = build_query_params(K, beam, final_beam_multiply=fm)
            row = {}
            for pallas in (False, True):
                bs.PALLAS_BEAM = pallas
                ids, _ = idx.batch_search(queries, filters, nq, qp)  # warm
                best = 1e9
                for _ in range(2):
                    t0 = time.perf_counter()
                    ids, _ = idx.batch_search(queries, filters, nq, qp)
                    best = min(best, time.perf_counter() - t0)
                rec = np.mean([
                    len(gt_sets[i] & set(ids[i].astype(np.int64).tolist()))
                    / max(1, len(gt_sets[i])) for i in range(nq)])
                row[pallas] = (nq / best, rec, ids.copy())
            (q0, r0, i0), (q1, r1, i1) = row[False], row[True]
            agree = float((i0 == i1).mean())
            log(f"beam={beam} fm={fm}: xla {q0:7.0f} qps r={r0:.4f} | "
                f"pallas {q1:7.0f} qps r={r1:.4f} | {q1 / q0:4.2f}x "
                f"ids-agree={agree:.4f}")
    bs.PALLAS_BEAM = True


def main_200k():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, 128)).astype(np.float32)
    assign = rng.integers(0, 1000, size=200_000)
    points = (centers[assign]
              + 0.35 * rng.normal(size=(200_000, 128))).astype(np.float32)
    labels = rng.uniform(size=200_000)
    nq = 10240
    queries = (centers[rng.integers(0, 1000, nq)]
               + 0.35 * rng.normal(size=(nq, 128))).astype(np.float32)
    starts = rng.uniform(0, 0.75, size=nq)
    filters = np.stack([starts, starts + 0.25], axis=1)
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/"),
        require_cache=True)
    log("200k graph loaded; inline:", idx._graph.inline_dtype)
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    gt_ids, _ = pre.batch_search(queries, filters, nq,
                                 build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
    del pre
    ab(idx, queries, filters, nq, gt_sets, beams=(10, 20, 40, 80, 160, 320),
       fms=(2, 4))


def main_1m():
    rng = np.random.default_rng(7)
    d, n, nq = 128, 1_000_000, 10240
    centers = rng.normal(size=(1000, d)).astype(np.float32)
    points = (centers[rng.integers(0, 1000, n)]
              + 0.35 * rng.normal(size=(n, d))).astype(np.float32)
    labels = rng.uniform(size=n)
    queries = (centers[rng.integers(0, 1000, nq)]
               + 0.35 * rng.normal(size=(nq, d))).astype(np.float32)
    starts = rng.uniform(0, 0.75, size=nq)
    filters = np.stack([starts, starts + 0.25], axis=1)
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=64, L=500, alpha=1.2, cache_path="bench_cache/"),
        require_cache=True)
    log("1M graph loaded; inline:", idx._graph.inline_dtype)
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    gt_ids, _ = pre.batch_search(queries, filters, nq,
                                 build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
    del pre
    ab(idx, queries, filters, nq, gt_sets, beams=(40, 80, 160))


if __name__ == "__main__":
    if "1m" in sys.argv[1:]:
        main_1m()
    else:
        main_200k()
        if "both" in sys.argv[1:]:
            main_1m()

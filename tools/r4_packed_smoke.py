"""Bounded on-chip smoke for the packed one-DMA Pallas beam variant ("3dp").

Packed is opt-in (RFANN_PALLAS_PACKED=1) and interpret-tested, but — like the
"2d" variant that hung the chip on 19 Aug — it is an unproven DMA pattern on
real TPUs, so it gets its own SHORT process under an external `timeout 600`
instead of riding inside the long verify/A-B runs. Order of operations:

  1. tiny-batch parity first (128 queries, beam 40) — if the kernel is going
     to hang, it hangs here and only this process dies;
  2. then a quick QPS A/B (xla | 3d | 3dp) at beams 40/160 on the cached
     200k bench graph (same data stream as tools/r4_verify_ab.ab_200k).

Run ONLY in a free chip window:
  timeout 600 python tools/r4_packed_smoke.py > /tmp/packed_smoke.log 2>&1
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

from rangefilteredann_tpu import (BuildParams, PostfilterVamanaIndex,
                                  build_query_params)
import rangefilteredann_tpu.ops.beam_search as bs
import rangefilteredann_tpu.ops.pallas_beam as pb

K = 10


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("devices:", jax.devices())
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
    qp = build_query_params(K, 40, final_beam_multiply=2)

    # step 1: tiny batch, hang containment. XLA reference first.
    qs, fs = queries[:128], filters[:128]
    ids_x, _ = idx.batch_search(qs, fs, 128, qp)
    bs.PALLAS_BEAM = True
    bs._PALLAS_BROKEN = False
    pb.LAYOUT = "3d"
    pb.PACKED = True
    t0 = time.time()
    ids_p, _ = idx.batch_search(qs, fs, 128, qp)
    log(f"3dp tiny batch returned in {time.time() - t0:.1f}s "
        f"(packed attached: {getattr(idx._graph, 'nbr_packed', None) is not None})")
    same = float(np.mean(np.asarray(ids_p) == np.asarray(ids_x)))
    log(f"3dp tiny parity ids-agree={same:.4f}")
    if same < 1.0:
        log("PARITY FAIL — stopping before A/B")
        sys.exit(1)

    # step 2: quick A/B on full protocol batches
    for beam in (40, 160):
        qp = build_query_params(K, beam, final_beam_multiply=2)
        row = {}
        for var in ("xla", "3d", "3dp"):
            bs.PALLAS_BEAM = var != "xla"
            bs._PALLAS_BROKEN = False
            pb.LAYOUT = "3d"
            pb.PACKED = var == "3dp"
            ids, _ = idx.batch_search(queries, filters, nq, qp)  # warm
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                ids, _ = idx.batch_search(queries, filters, nq, qp)
                best = min(best, time.perf_counter() - t0)
            row[var] = (nq / best, np.asarray(ids))
        (qx, ix), (q3, i3), (qq, iq) = row["xla"], row["3d"], row["3dp"]
        log(f"200k beam={beam}: xla {qx:7.0f} | 3d {q3:7.0f} "
            f"({q3 / qx:4.2f}x) | 3dp {qq:7.0f} ({qq / qx:4.2f}x) | "
            f"agree 3d={np.mean(i3 == ix):.4f} 3dp={np.mean(iq == ix):.4f}")
    log("packed smoke DONE")


if __name__ == "__main__":
    main()

"""Opportunistic: SuperOptimizedPostfilterTree at 1M (round-3 verdict
weakness #6 — the super family has no >= 1M numbers; the reference names
super postfiltering as its DEEP-10M method,
ref: src/super_optimized_postfilter_tree.h:29, run_our_method.py:14-20).

cutoff=31250 (5 split levels) keeps the overlapping-slab build inside ~1 h
(200k/cutoff=1000 was 1344 s, work-bound ~ rows x n x shift); rows cache
under bench_cache/ so an interrupted build resumes. Measures fractions
2^-2 / 2^-4 / 2^-6 with the reference beam ladder, early-stop at 0.99.

Run ONLY in a free chip window:
  nohup setsid env S1M_DEADLINE=<epoch> python tools/super1m.py \
      > /tmp/super1m.log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from r3_night import K, NQ, make_1m  # noqa: E402  (exact 1M rng stream)

from rangefilteredann_tpu import (BuildParams, SuperOptimizedPostfilterTree,
                                  build_query_params)
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

DEADLINE = float(os.environ.get("S1M_DEADLINE", time.time() + 150 * 60))
OUT = os.environ.get("S1M_OUT", "results/super_1m_r5.csv")
CUTOFF, SPLIT, SHIFT = 31_250, 2.0, 0.5


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def main():
    _, points, labels, queries = make_1m()
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")

    log(f"building super 1M cutoff={CUTOFF} split={SPLIT} shift={SHIFT} "
        f"({left_min():.0f} min budget)")
    t0 = time.time()
    sup = SuperOptimizedPostfilterTree(
        points, labels, cutoff=CUTOFF, split_factor=SPLIT,
        shift_factor=SHIFT, build_params=bp)
    log(f"super 1M built/loaded in {(time.time() - t0) / 60:.1f} min")

    pre = PrefilterIndex(points, labels, metric="Euclidian")
    qp10 = build_query_params(K, K)
    rows = ["filter_width,method,recall,average_time,qps,threads"]
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = [ln.rstrip("\n") for ln in f if ln.strip()]

    def flush():
        with open(OUT, "w") as f:
            f.write("\n".join(rows) + "\n")

    for fexp in (2, 4, 6):
        if left_min() < 6:
            break
        frng = np.random.default_rng(900 + fexp)
        frac = 2.0 ** -fexp
        lo = frng.uniform(0, 1 - frac, NQ)
        filters = np.stack([lo, lo + frac], 1)
        gt_ids, _ = pre.batch_search(queries, filters, NQ, qp10)
        gt = [set(r.astype(np.int64).tolist()) for r in gt_ids]
        for beam, fm in ((80, 2), (160, 2), (320, 2), (640, 2)):
            if left_min() < 4:
                break
            tag = f"super-postfiltering_{beam}_{fm}"
            if any(ln.startswith(f"2pow-{fexp},{tag},") for ln in rows):
                continue
            try:
                qp = build_query_params(K, beam, final_beam_multiply=fm)
                ids, _ = sup.batch_search(queries, filters, NQ, qp)  # warm
                best = 1e9
                for _ in range(2):
                    t1 = time.perf_counter()
                    ids, _ = sup.batch_search(queries, filters, NQ, qp)
                    best = min(best, time.perf_counter() - t1)
                rec = float(np.mean([
                    len(gt[i] & set(ids[i].astype(np.int64).tolist())) / K
                    for i in range(NQ)]))
                rows.append(f"2pow-{fexp},{tag},{rec:.4f},"
                            f"{best / NQ:.8f},{NQ / best:.1f},1")
                log(f"2pow-{fexp} {tag}: recall={rec:.4f} qps={NQ/best:.0f}")
                flush()
                if rec >= 0.99:
                    break
            except Exception:
                log(f"2pow-{fexp} {tag} FAILED\n" + traceback.format_exc())
                break
    flush()
    log("super1m done ->", OUT)


if __name__ == "__main__":
    main()

"""DEEP-10M multi-fraction protocol sweep (round-3 verdict item 1 "done"
criterion: >=1 graph/tree family at 10M, recall >= 0.9, >= 5 fractions).

Loads the cached 10M seed-23 L2 dataset (/tmp/night10m_data) and the
R=48/L=100 flat graph (bench_cache/deep10m_l2/), computes exact-prefilter GT
per fraction on-device (cheap: the scan runs at ~8k QPS even at 10M), and
sweeps flat postfiltering + the 2-row B-WST's fenwick/optimized methods
across fractions 2^0..2^-10 with the reference's early stop. Appends
resumably to results/deep10m_l2_r4.csv.

Run: nohup setsid env DEEP_DEADLINE=<epoch> python tools/deep10m_fracs.py \
        > /tmp/deep10m_fracs.log 2>&1 &
"""

import gc
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RFANN_INLINE_BUDGET", "9.5e9")

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from night_10m import make_data

from rangefilteredann_tpu import (
    BuildParams, RangeFilterTreeIndex, build_query_params)
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

K, NQ = 10, 2048
OUT = "results/deep10m_l2_r4.csv"
DEADLINE = float(os.environ.get("DEEP_DEADLINE", time.time() + 150 * 60))
FRACS = (0, 1, 2, 4, 6, 8, 10)
FMAX = np.float32(np.finfo(np.float32).max)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def main():
    log("loading 10M dataset (warm cache)...")
    points, labels, queries, _, _ = make_data()

    rows = ["filter_width,method,recall,average_time,qps,threads"]
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            old = [ln.rstrip("\n") for ln in f if ln.strip()]
        rows.extend(old[1:])
        for ln in old[1:]:
            c = ln.split(",")
            done[(c[0], c[1])] = float(c[2])
        log(f"resuming past {len(old) - 1} rows")

    def flush():
        with open(OUT, "w") as f:
            f.write("\n".join(rows) + "\n")

    def timed(fn):
        fn()
        best, out = 1e9, None
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return out, best

    # The 10M store pads to [10M, 128] f32 = 5.12 GB on device; prefilter +
    # flat graph + tree simultaneously is ~17 GB on a 16 GB chip (the
    # 15:48 OOM cascade). Run SECTIONS — GT for every fraction first, then
    # the flat graph, then the tree — scrubbing the device between them.
    def scrub():
        from rangefilteredann_tpu.models import base as _b

        _b._QCACHE.clear()  # else the cache maps to deleted device arrays
        gc.collect()
        try:
            for a in jax.live_arrays():
                a.delete()
        except Exception:
            pass
        jax.clear_caches()
        gc.collect()

    def frac_filters(fexp):
        frac = 2.0 ** -fexp
        frng = np.random.default_rng(5000 + fexp)
        lo = frng.uniform(0, 1 - frac, NQ) if frac < 1 else np.zeros(NQ)
        return np.stack([lo, lo + frac], 1)

    # --- section 1: exact GT + prefilter timing, all fractions ---
    gt = {}  # fexp -> list[set]
    pre = PrefilterIndex(points, labels, metric="l2")
    qp10 = build_query_params(K, K)
    for fexp in FRACS:
        if left_min() < 8:
            break
        filters = frac_filters(fexp)
        fw = f"2pow-{fexp}"
        ids_gt, d_gt = pre.batch_search(queries, filters, NQ, qp10)
        gt[fexp] = [set(ids_gt[q][d_gt[q] < FMAX].astype(np.int64).tolist())
                    for q in range(NQ)]
        if (fw, "prefiltering") not in done:
            _, dt = timed(lambda: pre.batch_search(
                queries, filters, NQ, qp10))
            rows.append(f"{fw},prefiltering,1.0000,{dt/NQ:.8f},{NQ/dt:.1f},1")
            log(f"{fw} prefiltering qps={NQ/dt:.0f}")
            flush()
    del pre
    scrub()
    log("GT section done; device scrubbed")

    def rec_of(fexp, ids):
        gs = gt[fexp]
        return float(np.mean(
            [len(gs[q] & set(ids[q].astype(np.int64).tolist()))
             / max(1, len(gs[q])) if gs[q] else 1.0 for q in range(NQ)]))

    def sweep(fexp, tag, fn_of, ladder):
        fw = f"2pow-{fexp}"
        filters = frac_filters(fexp)
        for beam, fm in ladder:
            prior = done.get((fw, f"{tag}_{beam}_{fm}"))
            if prior is not None:
                if prior >= 0.93:
                    break
                continue
            if left_min() < 5:
                return
            try:
                qp = build_query_params(K, beam, final_beam_multiply=fm)
                (ids, _), dt = timed(lambda qp=qp: fn_of(qp, filters))
                rec = rec_of(fexp, ids)
                rows.append(f"{fw},{tag}_{beam}_{fm},{rec:.4f},"
                            f"{dt/NQ:.8f},{NQ/dt:.1f},1")
                log(f"{fw} {tag}_{beam}_{fm}: recall={rec:.4f} "
                    f"qps={NQ/dt:.0f}")
                flush()
                if rec >= 0.93:
                    break
            except Exception:
                log(f"{fw} {tag}_{beam}_{fm} FAILED\n"
                    + traceback.format_exc())
                return

    bp = BuildParams(R=48, L=100, alpha=1.2,
                     cache_path="bench_cache/deep10m_l2/")

    # --- section 2: flat graph postfilter, all fractions ---
    idx = PostfilterVamanaIndex(points, labels, bp, metric="l2",
                                require_cache=True)
    log("flat 10M graph loaded")
    ladder = ((80, 2), (160, 2), (320, 2), (640, 2), (640, 4))
    for fexp in FRACS:
        if fexp not in gt or left_min() < 8:
            break
        sweep(fexp, "postfiltering",
              lambda qp, f: idx.batch_search(queries, f, NQ, qp), ladder)
    del idx
    scrub()
    log("flat section done; device scrubbed")

    # --- section 3: 2-row B-WST methods, all fractions ---
    try:
        tree = RangeFilterTreeIndex(
            points, labels, cutoff=5_000_000, split_factor=2,
            build_params=bp, metric="l2",
            device_rows_budget=4 << 30, require_cache=True)
        log("2-row 10M B-WST loaded")
    except FileNotFoundError:
        tree = None
        log("10M tree row cache absent — flat + prefilter only")
    if tree is not None:
        for fexp in FRACS:
            if fexp not in gt or left_min() < 6:
                break
            for tag, method in (("optimized-postfiltering",
                                 "optimized_postfilter"),
                                ("vamana-tree", "fenwick")):
                sweep(fexp, tag, lambda qp, f, m=method: tree.batch_search(
                    queries, f, NQ, m, qp),
                    ((80, 2), (160, 2), (320, 2), (640, 2)))
    flush()
    log("deep10m_fracs done ->", OUT)


if __name__ == "__main__":
    main()

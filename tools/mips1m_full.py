"""MIPS 1M full protocol sweep (round-3 verdict item 5): all 17 filter
fractions (2^0 .. 2^-16, ref experiments/run_our_method.py:29) on the cached
R=64/L=200 MIPS graph, plus a vertex-0 vs medoid start A/B at the fractions
where MIPS beam-hunger bites (the reference always starts at vertex 0,
ref src/postfilter_vamana.h:226-227; MIPS searches must escape the start
hub through doubling, so a centroid-closest start should reach equal recall
with fewer doubling rounds).

Resumes from results/landscape_1m_mips.csv: (fexp, method-tag) pairs already
recorded are skipped, so the round-3 partial sweep (crashed at 2^-6 on a
transient tunnel error) completes instead of re-running.

Run: nohup setsid python tools/mips1m_full.py > /tmp/mips1m_full.log 2>&1 &
Deadline: env MIPS_DEADLINE (epoch secs), default now + 100 min.
"""

import copy
import gc
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RFANN_INLINE_BUDGET", "9.5e9")

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rangefilteredann_tpu import BuildParams, build_query_params
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

K, NQ = 10, 2048
OUT = "results/landscape_1m_mips.csv"
DEADLINE = float(os.environ.get("MIPS_DEADLINE", time.time() + 100 * 60))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def main():
    rng = np.random.default_rng(11)
    n, d = 1_000_000, 100
    centers = rng.normal(size=(1000, d)).astype(np.float32)
    pts = (centers[rng.integers(0, 1000, n)]
           + 0.35 * rng.normal(size=(n, d))).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    labels = rng.uniform(size=n)
    qs = (centers[rng.integers(0, 1000, NQ)]
          + 0.35 * rng.normal(size=(NQ, d))).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    bp = BuildParams(R=64, L=200, alpha=1.2, cache_path="bench_cache/mips1m/")
    idx = PostfilterVamanaIndex(pts, labels, bp, metric="mips",
                                require_cache=True)
    # Medoid-start variant WITHOUT a second construction: building a second
    # PostfilterVamanaIndex attaches its OWN int8 inline slab (~7 GB) next
    # to idx's before the old sharing lines could drop it — that transient
    # OOM'd the 20:10 run at the prefilter upload. A shallow copy shares
    # every device array; the medoid needs only the host-side pass below
    # (identical expressions to models/postfilter_vamana.py:402-408).
    idx_med = copy.copy(idx)
    order = np.argsort(labels, kind="stable")
    ps_sorted = pts[order]
    mean = ps_sorted.astype(np.float64).mean(axis=0)
    dmed = (np.einsum("ij,ij->i", ps_sorted, ps_sorted)
            - 2.0 * (ps_sorted @ mean))
    idx_med._start = int(np.argmin(dmed))
    del order, ps_sorted, dmed
    gc.collect()
    log(f"MIPS graph loaded; medoid start = {idx_med._start}")
    pre = PrefilterIndex(pts, labels, metric="mips")
    qp10 = build_query_params(K, K)

    rows = ["filter_width,method,recall,average_time,qps,threads"]
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            old = [ln.rstrip("\n") for ln in f if ln.strip()]
        rows.extend(old[1:])
        for ln in old[1:]:
            cols = ln.split(",")
            done[(cols[0], cols[1])] = float(cols[2])
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

    # deterministic per-fraction filters (fresh stream per fexp: resuming
    # must not depend on how many fractions a prior run consumed)
    for fexp in range(0, 17):
        if left_min() < 6:
            log("deadline squeeze — stopping")
            break
        frac = 2.0 ** -fexp
        frng = np.random.default_rng(1000 + fexp)
        lo = frng.uniform(0, 1 - frac, NQ) if frac < 1 else np.zeros(NQ)
        filters = np.stack([lo, lo + frac], 1)
        fw = f"2pow-{fexp}"
        ids_gt, d_gt = pre.batch_search(qs, filters, NQ, qp10)
        fmax = np.float32(np.finfo(np.float32).max)
        gt_sets = [set(ids_gt[q][d_gt[q] < fmax].astype(np.int64).tolist())
                   for q in range(NQ)]

        def rec_of(ids):
            return float(np.mean(
                [len(gt_sets[q] & set(ids[q].astype(np.int64).tolist()))
                 / max(1, len(gt_sets[q])) if gt_sets[q] else 1.0
                 for q in range(NQ)]))

        if (fw, "prefiltering") not in done:
            _, dt = timed(lambda: pre.batch_search(qs, filters, NQ, qp10))
            rows.append(f"{fw},prefiltering,1.0000,{dt/NQ:.8f},{NQ/dt:.1f},1")
            log(f"{fw} prefiltering qps={NQ/dt:.0f}")
            flush()

        for tag, index in (("postfiltering-mips", idx),
                           ("postfiltering-mips-medoid", idx_med)):
            if tag.endswith("medoid") and fexp not in (2, 4, 6):
                continue  # A/B at the beam-hungry fractions only
            ladder = ((80, 2), (160, 2), (320, 2), (320, 4), (640, 2))
            for beam, fm in ladder:
                prior = done.get((fw, f"{tag}_{beam}_{fm}"))
                if prior is not None:
                    if prior >= 0.95:  # this rung ended the original sweep
                        break
                    continue
                if left_min() < 4:
                    break
                try:
                    qp = build_query_params(K, beam, final_beam_multiply=fm)
                    (res, _), dt = timed(
                        lambda qp=qp, ix=index: ix.batch_search(
                            qs, filters, NQ, qp))
                    rec = rec_of(res)
                    rows.append(f"{fw},{tag}_{beam}_{fm},{rec:.4f},"
                                f"{dt/NQ:.8f},{NQ/dt:.1f},1")
                    log(f"{fw} {tag}_{beam}_{fm}: recall={rec:.4f} "
                        f"qps={NQ/dt:.0f}")
                    flush()
                    if rec >= 0.95:
                        break
                except Exception:
                    log(f"{fw} {tag}_{beam}_{fm} FAILED\n"
                        + traceback.format_exc())
                    break
    flush()
    log("mips1m_full done")


if __name__ == "__main__":
    main()

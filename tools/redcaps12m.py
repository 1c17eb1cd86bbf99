"""RedCaps-class 12M x 512 uint8 GRAPH demo (round-4 verdict item 4).

The reference's RedCaps dataset is 12M L2-normalized 512-d CLIP image
embeddings with posting timestamps as filter values
(ref: generate_datasets/generate_redcaps_data.py:15-16,33-36,65-80); the
uint8 store matches the reference's Uint8 Euclidian variant
(ref: ParlayANN/.../euclidian_point.h:68-112 — integer distances on byte
data). CLIP embeddings have LOW intrinsic dimension, so the synthetic stand-in
is latent-16: x = normalize(z @ W), z ~ N(0, I_16), quantized to uint8 —
NOT concentrated clusters, which collapse pairwise-distance variance and
degenerate RobustPrune (round-3 postmortem; ref RobustPrune:
ParlayANN/algorithms/vamana/index.h:94-103). On the unit sphere L2 ranks
identically to angular/IP, so the graph builds and searches in L2 and keeps
cut pruning (the night_10m_l2 lesson).

Stages (sectioned — never hold two 12M indices on the 16 GB chip):
  1. exact-prefilter GT + QPS per fraction (uint8 store, bf16-exact scan),
  2. flat R=48/L=100 L2 graph build (~2.5-3.5h; bf16 byte matmuls are one
     MXU pass, so 12M x 512 bytes costs about the same as 10M x 96 fp32),
     cached under bench_cache/redcaps12m/, then device scrub,
  3. reload graph from cache (validates the npz roundtrip) + doubling-
     postfilter ladder per fraction, early-stop at recall >= 0.99.

Appends resumably to results/redcaps12m_r4.csv.

Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      nice -n 19 python tools/redcaps12m.py --gen-only   # CPU pregen
  nohup setsid env RC_DEADLINE=<epoch> python tools/redcaps12m.py \
      > /tmp/redcaps12m.log 2>&1 &
"""

import argparse
import gc
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, D, LAT, NQ, K = 12_000_000, 512, 16, 2048, 10
SCALE = 360.0  # unit-sphere comp std ~ 1/sqrt(512)=0.044; 127/360=0.35 clip
CACHE_DIR = "/tmp/redcaps12m_data"
GRAPH_CACHE = "bench_cache/redcaps12m/"
OUT = "results/redcaps12m_r4.csv"
FRACS = (0, 1, 2, 4, 6, 8)
DEADLINE = float(os.environ.get("RC_DEADLINE", time.time() + 6 * 3600))
FMAX = np.float32(np.finfo(np.float32).max)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def make_data(write_cache=False):
    names = ("data", "labels", "queries")
    if not write_cache and all(
            os.path.exists(f"{CACHE_DIR}/{n}.npy") for n in names):
        return [np.load(f"{CACHE_DIR}/{n}.npy") for n in names]
    rng = np.random.default_rng(41)
    W = rng.standard_normal((LAT, D), dtype=np.float32)

    def quantize(z):
        x = z @ W
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        np.rint(x * SCALE + 128.0, out=x)
        np.clip(x, 0.0, 255.0, out=x)
        return x.astype(np.uint8)

    data = np.empty((N, D), dtype=np.uint8)
    for lo in range(0, N, 1_000_000):
        data[lo:lo + 1_000_000] = quantize(
            rng.standard_normal((1_000_000, LAT), dtype=np.float32))
        log(f"gen {lo + 1_000_000:,}/{N:,}")
    # labels and points are independent iid streams: sorting labels alone
    # preserves the joint law and takes sort_by_labels' identity fast path
    labels = np.sort(rng.uniform(size=N))
    queries = quantize(rng.standard_normal((NQ, LAT), dtype=np.float32))
    if write_cache:
        os.makedirs(CACHE_DIR, exist_ok=True)
        for n, arr in zip(names, (data, labels, queries)):
            np.save(f"{CACHE_DIR}/{n}.npy", arr)
    return [data, labels, queries]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen-only", action="store_true")
    args = ap.parse_args()
    if args.gen_only:
        make_data(write_cache=True)
        log("cached ->", CACHE_DIR)
        return

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    log("redcaps12m: loading 12M x 512 uint8 (latent-16, seed 41)...")
    points, labels, queries = make_data()
    qf = queries.astype(np.float32)

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

    def scrub():
        from rangefilteredann_tpu.models import base as _b

        _b._QCACHE.clear()
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
        frng = np.random.default_rng(7000 + fexp)
        lo = frng.uniform(0, 1 - frac, NQ) if frac < 1 else np.zeros(NQ)
        return np.stack([lo, lo + frac], 1)

    # --- section 1: exact GT + prefilter QPS, all fractions ---
    gt = {}
    pre = PrefilterIndex(points, labels, metric="l2")
    qp10 = build_query_params(K, K)
    for fexp in FRACS:
        if left_min() < 200:  # keep room for the build
            break
        filters = frac_filters(fexp)
        fw = f"2pow-{fexp}"
        ids_gt, d_gt = pre.batch_search(qf, filters, NQ, qp10)
        gt[fexp] = [set(ids_gt[q][d_gt[q] < FMAX].astype(np.int64).tolist())
                    for q in range(NQ)]
        if (fw, "prefiltering") not in done:
            _, dt = timed(lambda: pre.batch_search(qf, filters, NQ, qp10))
            rows.append(f"{fw},prefiltering,1.0000,{dt/NQ:.8f},{NQ/dt:.1f},1")
            log(f"{fw} prefiltering qps={NQ/dt:.0f}")
            flush()
    del pre
    scrub()
    log("GT section done; device scrubbed")

    # --- section 2: flat graph build (skipped if cached) ---
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path=GRAPH_CACHE)
    os.makedirs(GRAPH_CACHE, exist_ok=True)
    try:
        PostfilterVamanaIndex(points, labels, bp, metric="l2",
                              require_cache=True)
        log("12M graph cache already present")
    except FileNotFoundError:
        if left_min() < 195:
            log(f"only {left_min():.0f} min left — not starting the ~3h "
                "build; GT/prefilter rows stand")
            flush()
            return
        t0 = time.time()
        PostfilterVamanaIndex(points, labels, bp, metric="l2")
        log(f"12M R=48/L=100 uint8 graph built in {(time.time()-t0)/60:.1f} "
            f"min -> {GRAPH_CACHE}")
    scrub()

    # --- section 3: reload from cache + postfilter ladder ---
    idx = PostfilterVamanaIndex(points, labels, bp, metric="l2",
                                require_cache=True)
    log("12M graph loaded from cache")

    def rec_of(fexp, ids):
        gs = gt[fexp]
        return float(np.mean(
            [len(gs[q] & set(ids[q].astype(np.int64).tolist()))
             / max(1, len(gs[q])) if gs[q] else 1.0 for q in range(NQ)]))

    ladder = ((80, 2), (160, 2), (320, 2), (640, 2), (640, 4))
    for fexp in FRACS:
        if fexp not in gt or left_min() < 6:
            break
        fw = f"2pow-{fexp}"
        filters = frac_filters(fexp)
        for beam, fm in ladder:
            prior = done.get((fw, f"postfiltering_{beam}_{fm}"))
            if prior is not None:
                if prior >= 0.99:
                    break
                continue
            if left_min() < 5:
                break
            try:
                qp = build_query_params(K, beam, final_beam_multiply=fm)
                (ids, _), dt = timed(
                    lambda qp=qp: idx.batch_search(qf, filters, NQ, qp))
                rec = rec_of(fexp, ids)
                rows.append(f"{fw},postfiltering_{beam}_{fm},{rec:.4f},"
                            f"{dt/NQ:.8f},{NQ/dt:.1f},1")
                log(f"{fw} postfiltering_{beam}_{fm}: recall={rec:.4f} "
                    f"qps={NQ/dt:.0f}")
                flush()
                if rec >= 0.99:
                    break
            except Exception:
                log(f"{fw} postfiltering_{beam}_{fm} FAILED\n"
                    + traceback.format_exc())
                break
    flush()
    log("redcaps12m done ->", OUT)


if __name__ == "__main__":
    main()

"""Reference-protocol runs at scale, one TPU process (round-2 verdict item 4):

  A. beam/fm sweep on the cached 1M graph (int8-quantized inline) at 2^-2
  B. full 17-fraction landscape at 1M -> results/landscape_1m.csv
     (prefilter, flat postfilter where sane, B-WST fenwick/opt/three-split)
  C. MIPS (angular) landscape at 200k -> results/landscape_200k_mips.csv
     (covers config #2's metric: GloVe-style normalized vectors, MIPS search)
  D. stronger 1M graph (R=64, L=200) build + sweep — the recall-at-scale fix
     (round-1 graphs are R=48/L=100; the reference protocol class is R=64)
  E. 1M super-tree row builds (single-shape padded slabs) — cached for the
     landscape/bench of this and future rounds

Each phase is independent; failures skip to the next. Run:
  nohup setsid python tools/protocol_1m.py > /tmp/protocol1m.log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rangefilteredann_tpu import (
    BuildParams, RangeFilterTreeIndex, SuperOptimizedPostfilterTree,
    build_query_params)
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

K = 10
NQ = 2048
FMAX = np.float32(np.finfo(np.float32).max)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def make_data(n, d, seed, normalize=False):
    """EXACT rng consumption order of tools/bench_1m.py (centers, point
    assignment, point noise, LABELS, then queries) — the cached 1M graphs
    are keyed by params only, so a different label draw order silently
    mismatches them (this burned phase A/B once; caches now also carry
    content fingerprints as a backstop)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(1000, d)).astype(np.float32)
    pts = (centers[rng.integers(0, 1000, n)]
           + 0.35 * rng.normal(size=(n, d))).astype(np.float32)
    labels = rng.uniform(size=n)
    qs = (centers[rng.integers(0, 1000, NQ)]
          + 0.35 * rng.normal(size=(NQ, d))).astype(np.float32)
    if normalize:
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return rng, pts, labels, qs


def landscape(tag, out_csv, pre, others, rng, queries, max_pow=16,
              post_max_pow=6):
    """others: list of (name, fn(queries, filters, nq) -> (ids, dists),
    max_pow)."""
    rows = ["filter_width,method,recall,average_time,qps,threads"]
    qp10 = build_query_params(K, K)
    for i in range(0, max_pow + 1):
        frac = 2.0 ** -i
        width = min(frac, 1.0)
        lo = rng.uniform(0, 1 - width, NQ) if width < 1 else np.zeros(NQ)
        filters = np.stack([lo, lo + width], 1)
        ids_gt, d_gt = pre.batch_search(queries, filters, NQ, qp10)
        gt_sets = [set(ids_gt[q][d_gt[q] < FMAX].astype(np.int64).tolist())
                   for q in range(NQ)]

        def run(name, fn):
            try:
                fn(queries, filters, NQ)  # warm
                best, ids, d = 1e9, None, None
                for _ in range(2):
                    t0 = time.perf_counter()
                    ids, d = fn(queries, filters, NQ)
                    best = min(best, time.perf_counter() - t0)
                rec = np.mean([
                    (len(gt_sets[q]
                         & set(ids[q][d[q] < FMAX].astype(np.int64).tolist()))
                     / len(gt_sets[q])) if gt_sets[q] else 1.0
                    for q in range(NQ)])
                rows.append(f"2pow{-i},{name},{rec:.4f},{best/NQ:.8f},"
                            f"{NQ/best:.1f},1")
                log(f"{tag} 2^-{i} {name}: recall={rec:.4f} qps={NQ/best:.0f}")
            except Exception:
                log(f"{tag} 2^-{i} {name}: FAILED\n{traceback.format_exc()}")

        run("prefiltering", lambda q, f, n: pre.batch_search(q, f, n, qp10))
        for name, fn, mp in others:
            if i <= mp:
                run(name, fn)
        os.makedirs("results", exist_ok=True)
        with open(out_csv, "w") as f:
            f.write("\n".join(rows) + "\n")
    log(f"wrote {out_csv}")


def phase_ab():
    N, D = 1_000_000, 128
    rng, points, labels, queries = make_data(N, D, seed=7)
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    idx = PostfilterVamanaIndex(points, labels, bp)
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    # --- A: sweep at 2^-2 for the >=0.99 crossing ---
    frac = 0.25
    lo = rng.uniform(0, 1 - frac, NQ)
    filters = np.stack([lo, lo + frac], 1)
    ids_gt, _ = pre.batch_search(queries, filters, NQ, build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]
    for beam, fm in ((80, 4), (160, 2), (160, 4), (320, 2)):
        qp = build_query_params(K, beam, final_beam_multiply=fm)
        idx.batch_search(queries, filters, NQ, qp)
        t0 = time.perf_counter()
        ids, _ = idx.batch_search(queries, filters, NQ, qp)
        dt = time.perf_counter() - t0
        rec = np.mean([len(gt_sets[i] & set(ids[i].astype(np.int64).tolist()))
                       / K for i in range(NQ)])
        log(f"A: 1M 2^-2 beam={beam} fm={fm}: recall={rec:.4f} "
            f"qps={NQ/dt:.0f}")
    # --- B: landscape ---
    # drop the 6.3 GB inline blocks before the tree's 11 rows come on device
    # (HBM: data+graphs+inline+tree would exceed the ~13.5 GB usable)
    idx._graph.nbr_vecs = None
    idx._graph.nbr_norms = None
    idx._graph.nbr_scale = None
    tree = RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                                build_params=bp)
    qp80 = build_query_params(K, 80, final_beam_multiply=2)
    qp40 = build_query_params(K, 40, final_beam_multiply=2)
    others = [
        ("postfiltering_80_2",
         lambda q, f, n: idx.batch_search(q, f, n, qp80), 6),
        ("vamana-tree_40",
         lambda q, f, n: tree.batch_search(q, f, n, "fenwick", qp40), 16),
        ("three-split_40",
         lambda q, f, n: tree.batch_search(q, f, n, "three_split", qp40), 16),
        ("optimized-postfiltering_40",
         lambda q, f, n: tree.batch_search(q, f, n, "optimized_postfilter",
                                           qp40), 16),
    ]
    landscape("B[1M]", "results/landscape_1m.csv", pre, others, rng, queries)


def phase_c():
    N, D = 200_000, 100
    rng, points, labels, queries = make_data(N, D, seed=13, normalize=True)
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/mips/")
    pre = PrefilterIndex(points, labels, metric="mips")
    t0 = time.time()
    idx = PostfilterVamanaIndex(points, labels, bp, metric="mips")
    log(f"C: mips flat build/load {time.time()-t0:.0f}s")
    t0 = time.time()
    tree = RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                                build_params=bp, metric="mips")
    log(f"C: mips tree build/load {time.time()-t0:.0f}s")
    qp80 = build_query_params(K, 80, final_beam_multiply=4)
    qp40 = build_query_params(K, 40, final_beam_multiply=4)
    others = [
        ("postfiltering_80_4",
         lambda q, f, n: idx.batch_search(q, f, n, qp80), 6),
        ("vamana-tree_40",
         lambda q, f, n: tree.batch_search(q, f, n, "fenwick", qp40), 16),
        ("optimized-postfiltering_40",
         lambda q, f, n: tree.batch_search(q, f, n, "optimized_postfilter",
                                           qp40), 16),
    ]
    landscape("C[mips200k]", "results/landscape_200k_mips.csv", pre, others,
              rng, queries)


def phase_d():
    N, D = 1_000_000, 128
    rng, points, labels, queries = make_data(N, D, seed=7)
    bp = BuildParams(R=64, L=200, alpha=1.2, cache_path="bench_cache/")
    t0 = time.time()
    idx = PostfilterVamanaIndex(points, labels, bp)
    log(f"D: 1M R=64 L=200 build/load: {(time.time()-t0)/60:.1f} min")
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    frac = 0.25
    lo = rng.uniform(0, 1 - frac, NQ)
    filters = np.stack([lo, lo + frac], 1)
    ids_gt, _ = pre.batch_search(queries, filters, NQ, build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]
    for beam, fm in ((80, 2), (80, 4), (160, 2), (160, 4)):
        qp = build_query_params(K, beam, final_beam_multiply=fm)
        idx.batch_search(queries, filters, NQ, qp)
        t0 = time.perf_counter()
        ids, _ = idx.batch_search(queries, filters, NQ, qp)
        dt = time.perf_counter() - t0
        rec = np.mean([len(gt_sets[i] & set(ids[i].astype(np.int64).tolist()))
                       / K for i in range(NQ)])
        log(f"D: 1M R64L200 2^-2 beam={beam} fm={fm}: recall={rec:.4f} "
            f"qps={NQ/dt:.0f}")


def phase_e():
    N, D = 1_000_000, 128
    rng, points, labels, queries = make_data(N, D, seed=7)
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    t0 = time.time()
    sup = SuperOptimizedPostfilterTree(
        points, labels, cutoff=1000, split_factor=2.0, shift_factor=0.5,
        build_params=bp)
    log(f"E: 1M super build/load: {(time.time()-t0)/60:.1f} min")
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    qp40 = build_query_params(K, 40, final_beam_multiply=2)
    for i in (2, 6, 10):
        frac = 2.0 ** -i
        lo = rng.uniform(0, 1 - frac, NQ)
        filters = np.stack([lo, lo + frac], 1)
        ids_gt, d_gt = pre.batch_search(queries, filters, NQ,
                                        build_query_params(K, K))
        gt_sets = [set(ids_gt[q][d_gt[q] < FMAX].astype(np.int64).tolist())
                   for q in range(NQ)]
        sup.batch_search(queries, filters, NQ, qp40)
        t0 = time.perf_counter()
        ids, d = sup.batch_search(queries, filters, NQ, qp40)
        dt = time.perf_counter() - t0
        rec = np.mean([
            (len(gt_sets[q] & set(ids[q][d[q] < FMAX].astype(np.int64)
                                  .tolist())) / len(gt_sets[q]))
            if gt_sets[q] else 1.0 for q in range(NQ)])
        log(f"E: 1M super 2^-{i}: recall={rec:.4f} qps={NQ/dt:.0f}")


if __name__ == "__main__":
    for name, fn in (("A+B", phase_ab), ("C", phase_c), ("D", phase_d),
                     ("E", phase_e)):
        try:
            log(f"=== phase {name} ===")
            fn()
        except Exception:
            log(f"phase {name} FAILED\n{traceback.format_exc()}")
    log("protocol_1m done")

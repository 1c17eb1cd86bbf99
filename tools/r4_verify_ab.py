"""Round-4 post-chain run, ONE TPU process (claim transitions cost 5-20 min):

  verify — drive the public API end-to-end on the real chip against a
      float64 NumPy oracle (the .claude/skills/verify recipe): exact
      prefilter == oracle (L2 and MIPS); every graph family >= its recall
      threshold on clustered data; the fused Pallas beam kernel (new "3d"
      batched-dot_general layout AND the "2d" segment-matmul fallback)
      exercised ON-CHIP through the public batch_search route, frontier
      parity vs the XLA path asserted.
  ab — on-chip QPS A/B at bench.py's 200k protocol config (cached graph):
      XLA vs pallas-3d vs pallas-2d per beam at fm=2, then the 1M
      int8-inline config (3d only) if the deadline allows.

Run (chip must be free):
  nohup setsid env VAB_DEADLINE=<epoch> python tools/r4_verify_ab.py \
      > /tmp/r4_verify_ab.log 2>&1 &
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

from rangefilteredann_tpu import (BuildParams, PostfilterVamanaIndex,
                                  PrefilterIndex, RangeFilterTreeIndex,
                                  SuperOptimizedPostfilterTree,
                                  build_query_params)
import rangefilteredann_tpu.ops.beam_search as bs
import rangefilteredann_tpu.ops.pallas_beam as pb

K = 10
DEADLINE = float(os.environ.get("VAB_DEADLINE", time.time() + 45 * 60))
FAILURES = []


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def check(name, ok, detail=""):
    log(("PASS" if ok else "FAIL"), name, detail)
    if not ok:
        FAILURES.append(f"{name}: {detail}")


# --- count actual fused-kernel invocations (the on-chip parity check is
# vacuous if eligibility silently routed everything to the XLA path) ---
_N_PALLAS = [0]
_orig_safe = bs.pallas_beam_search_safe


def _counting_safe(*a, **kw):
    out = _orig_safe(*a, **kw)
    if out is not None:
        _N_PALLAS[0] += 1
    return out


bs.pallas_beam_search_safe = _counting_safe
# the models call through the bs module attribute, so patching bs is enough


def clustered(rng, n, nq, d, n_centers=500, spread=0.35):
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    pts = (centers[rng.integers(0, n_centers, n)]
           + spread * rng.normal(size=(n, d))).astype(np.float32)
    qs = (centers[rng.integers(0, n_centers, nq)]
          + spread * rng.normal(size=(nq, d))).astype(np.float32)
    return pts, qs


def oracle_topk(points, labels, queries, filters, k, metric):
    """fp64 windowed top-k. Returns (kth_metric_value[nq], windows)."""
    order = np.argsort(labels, kind="stable")
    slab = np.sort(labels)
    p64 = points.astype(np.float64)[order]
    kth = np.empty(len(queries))
    wins = []
    for i, q in enumerate(queries):
        lo, hi = np.searchsorted(slab, filters[i, 0]), np.searchsorted(
            slab, filters[i, 1])
        w = p64[lo:hi]
        if metric == "mips":
            sc = -(w @ q.astype(np.float64))
        else:
            sc = ((w - q.astype(np.float64)) ** 2).sum(1)
        kk = min(k, hi - lo)
        kth[i] = np.sort(sc)[kk - 1] if kk else np.inf
        wins.append((lo, hi, order))
    return kth


def recall_vs_oracle(ids, points, labels, queries, filters, kth, k, metric):
    """Ties-aware recall: a returned id counts if inside the window and its
    fp64 score <= kth + eps (the reference's check_recall tie rule)."""
    p64 = points.astype(np.float64)
    got = 0.0
    for i, q in enumerate(queries):
        r = ids[i].astype(np.int64)
        r = r[(r >= 0) & (r < len(points))]
        lab = labels[r]
        inwin = (lab >= filters[i, 0]) & (lab < filters[i, 1])
        r = r[inwin]
        if metric == "mips":
            sc = -(p64[r] @ q.astype(np.float64))
        else:
            sc = ((p64[r] - q.astype(np.float64)) ** 2).sum(1)
        eps = 1e-6 * max(1.0, abs(kth[i])) if np.isfinite(kth[i]) else 0.0
        got += min(k, int((sc <= kth[i] + eps).sum())) / k
    return got / len(queries)


SMOKE = os.environ.get("VAB_SMOKE", "0") != "0"


def verify():
    rng = np.random.default_rng(7)
    n, nq, d = (4_000, 100, 100) if SMOKE else (20_000, 100, 100)
    points, queries = clustered(rng, n, nq, d)
    labels = rng.uniform(size=n)
    st = rng.uniform(0, 0.8, size=nq).astype(np.float64)
    filters = np.stack([st, st + 2.0 ** -4], 1)

    for metric in ("Euclidian", "mips"):
        m = "mips" if metric == "mips" else "l2"
        kth = oracle_topk(points, labels, queries, filters, K, m)
        idx = PrefilterIndex(points, labels, metric=metric)
        ids, _ = idx.batch_search(queries, filters, nq,
                                  build_query_params(K, K))
        rec = recall_vs_oracle(np.asarray(ids), points, labels, queries,
                               filters, kth, K, m)
        check(f"prefilter-exact-{m}", rec >= 0.9999, f"recall={rec:.5f}")

    kth = oracle_topk(points, labels, queries, filters, K, "l2")
    bp = BuildParams(R=32, L=64, alpha=1.2)
    qp = build_query_params(K, 40, final_beam_multiply=2)

    t0 = time.time()
    pf = PostfilterVamanaIndex(points, labels, bp)
    log(f"20k vamana built in {time.time() - t0:.0f}s")
    ids_xla, _ = pf.batch_search(queries, filters, nq, qp)
    rec = recall_vs_oracle(np.asarray(ids_xla), points, labels, queries,
                           filters, kth, K, "l2")
    check("postfilter-xla", rec >= 0.95, f"recall={rec:.4f}")

    # fused kernel through the public route, parity vs XLA. "2d" is NOT
    # run on-chip: with the pl.when-gated DMAs the 2d variant HUNG the
    # 20:20 run (host asleep on a remote call ~20 min — either a Mosaic
    # remote-compile hang or an on-chip deadlock; the UNGATED 2d kernel
    # ran fine at 16:02). 2d stays interpret-tested fallback only.
    # "3dp" (packed one-DMA) is NOT run here: like the dropped "2d" it is an
    # on-chip-unproven DMA pattern and a hang would eat this process's whole
    # timeout + wedge the chip ahead of adv1m/mips. It gets its own bounded
    # standalone smoke (timeout 600) after the retry chain drains.
    variants = (("3d",) if jax.default_backend() == "tpu"
                else ())
    if not variants:
        log("SKIP pallas on-chip checks (backend is not tpu)")
    for var in variants:
        bs.PALLAS_BEAM = True
        pb.LAYOUT = "3d" if var == "3dp" else var
        pb.PACKED = var == "3dp"
        bs._PALLAS_BROKEN = False
        n0 = _N_PALLAS[0]
        ids_pl, _ = pf.batch_search(queries, filters, nq, qp)
        ran = _N_PALLAS[0] > n0
        check(f"pallas-{var}-invoked", ran,
              f"kernel calls +{_N_PALLAS[0] - n0}")
        same = float(np.mean(np.asarray(ids_pl) == np.asarray(ids_xla)))
        # f32 inline parity is exact (tests/test_pallas_beam.py); int8 would
        # be recall-level, but 20k attaches f32
        dt = pf._graph.inline_dtype
        want = 1.0 if dt == "float32" else 0.99
        check(f"pallas-{var}-parity", same >= want,
              f"ids-agree={same:.4f} inline={dt}")
    bs.PALLAS_BEAM = False
    pb.PACKED = False

    tr = RangeFilterTreeIndex(points, labels, build_params=bp)
    for qm in ("fenwick", "optimized_postfilter", "three_split"):
        ids, _ = tr.batch_search(queries, filters, nq, qm, qp)
        rec = recall_vs_oracle(np.asarray(ids), points, labels, queries,
                               filters, kth, K, "l2")
        check(f"tree-{qm}", rec >= 0.9, f"recall={rec:.4f}")
    del tr

    sup = SuperOptimizedPostfilterTree(points, labels, build_params=bp)
    ids, _ = sup.batch_search(queries, filters, nq, qp)
    rec = recall_vs_oracle(np.asarray(ids), points, labels, queries,
                           filters, kth, K, "l2")
    check("super-tree", rec >= 0.9, f"recall={rec:.4f}")
    del sup, pf


def ab_200k():
    """XLA vs pallas-3d vs pallas-2d at bench.py's 200k protocol config."""
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

    results = {}
    for beam in (10, 20, 40, 80, 160, 320):
        if left_min() < 4:
            log("deadline: stopping 200k A/B")
            break
        qp = build_query_params(K, beam, final_beam_multiply=2)
        row = {}
        for var in ("xla", "3d"):
            bs.PALLAS_BEAM = var != "xla"
            bs._PALLAS_BROKEN = False
            pb.LAYOUT = "3d"
            pb.PACKED = False
            ids, _ = idx.batch_search(queries, filters, nq, qp)  # warm
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                ids, _ = idx.batch_search(queries, filters, nq, qp)
                best = min(best, time.perf_counter() - t0)
            rec = np.mean([
                len(gt_sets[i] & set(ids[i].astype(np.int64).tolist()))
                / max(1, len(gt_sets[i])) for i in range(nq)])
            row[var] = (nq / best, rec, np.asarray(ids))
        (qx, rx, ix), (q3, r3, i3) = row["xla"], row["3d"]
        log(f"200k beam={beam}: xla {qx:7.0f} r={rx:.4f} | "
            f"3d {q3:7.0f} ({q3 / qx:4.2f}x) | "
            f"agree 3d={np.mean(i3 == ix):.4f}")
        results[beam] = (qx, q3)
    bs.PALLAS_BEAM = False
    pb.PACKED = False
    del idx
    for a in jax.live_arrays():
        a.delete()
    jax.clear_caches()
    return results


def ab_1m():
    """1M int8-inline config, XLA vs 3d (the flagship bench family)."""
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
    for beam in (40, 80):
        if left_min() < 4:
            break
        qp = build_query_params(K, beam, final_beam_multiply=2)
        row = {}
        for var in ("xla", "3d"):
            bs.PALLAS_BEAM = var != "xla"
            bs._PALLAS_BROKEN = False
            pb.LAYOUT = "3d"
            ids, _ = idx.batch_search(queries, filters, nq, qp)
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                ids, _ = idx.batch_search(queries, filters, nq, qp)
                best = min(best, time.perf_counter() - t0)
            rec = np.mean([
                len(gt_sets[i] & set(ids[i].astype(np.int64).tolist()))
                / max(1, len(gt_sets[i])) for i in range(nq)])
            row[var] = (nq / best, rec)
        (qx, rx), (q3, r3) = row["xla"], row["3d"]
        log(f"1M beam={beam}: xla {qx:7.0f} r={rx:.4f} | "
            f"3d {q3:7.0f} r={r3:.4f} ({q3 / qx:4.2f}x)")
    bs.PALLAS_BEAM = False


if __name__ == "__main__":
    log("devices:", jax.devices())
    log("=== verify (public API vs fp64 oracle, on-chip) ===")
    verify()
    log("=== A/B 200k (xla | pallas-3d | pallas-2d) ===")
    if SMOKE:
        log("smoke mode: skipping A/B")
    elif left_min() > 8:
        ab_200k()
    else:
        log("deadline: skipping 200k A/B")
    log("=== A/B 1M int8 (xla | pallas-3d) ===")
    if SMOKE:
        log("smoke mode: skipping A/B")
    elif left_min() > 10:
        ab_1m()
    else:
        log("deadline: skipping 1M A/B")
    if FAILURES:
        log(f"VERIFY: {len(FAILURES)} FAILURE(S)")
        for f in FAILURES:
            log("  -", f)
        sys.exit(1)
    log("VERIFY: ALL PASS")

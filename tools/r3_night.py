"""Round-3 night runner: ONE TPU process for every long build (the whole
round-2 cache tree was wiped between rounds, so bench_cache/ and the 10M/1M
graphs all rebuild from scratch this round).

Phases, in priority order (each time-gated against R3_DEADLINE, each
independent, all caches resumable):

  bench200k   rebuild bench.py's caches: 200k flat + 9 B-WST rows + super
  m1_protocol 1M seed-7: R=64/L=500 protocol-class flat graph (VERDICT #2),
              GT + beam sweep at 2^-2 with int8 inline + exact rerank
  deep10m     10M seed-23 L2-on-sphere: GT + flat R=48/L=100 graph + beam
              sweeps at 2^-2 / 2^-6 (VERDICT #1 core)
  m1_tree     1M B-WST all rows (landscape + full-grid input)
  m1_grid     1M reference-style sweep with early-stop across all 17
              fractions -> results/run_1m_r3.csv (VERDICT #4)
  mips1m      1M MIPS flat graph + landscape rows (VERDICT #8)
  deep10m_tree 2-row 10M B-WST (row 1 = 2x5M builds) + fenwick/optimized
              eval under device_rows_budget (VERDICT #1 stretch)

Run: nohup setsid python tools/r3_night.py > /tmp/r3_night.log 2>&1 &
Deadline: env R3_DEADLINE (epoch secs), default now + 9 h.
"""

import gc
import glob
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("RFANN_INLINE_BUDGET", "9.5e9")

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

RESULTS = "results/scale_demos_r3.log"
K, NQ = 10, 2048
DEADLINE = float(os.environ.get("R3_DEADLINE", time.time() + 9 * 3600))
FMAX = np.float32(np.finfo(np.float32).max)


def log(*a):
    line = f"[{time.strftime('%H:%M:%S')}] " + " ".join(str(x) for x in a)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def left_min():
    return (DEADLINE - time.time()) / 60.0


def scrub_device():
    """Hard HBM reset between phases. Round-3 lesson: the first runner's
    m1_protocol OOM (attach_inline trim copy, since fixed) left HBM
    holding dead buffers and EVERY later phase OOM'd at its first
    device_put. Drop the package's device caches, collect, delete every
    remaining live device array, and clear the jit caches (compiled fns
    close over device constants); the persistent .jax_cache keeps
    re-traces cheap."""
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


def recall_of(ids, gt_sets):
    return float(np.mean(
        [len(gt_sets[i] & set(ids[i].astype(np.int64).tolist()))
         / max(1, len(gt_sets[i])) for i in range(len(gt_sets))]))


def make_1m(seed=7, n=1_000_000, d=128):
    """EXACT rng stream of tools/protocol_1m.make_data (cache fingerprints)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(1000, d)).astype(np.float32)
    pts = (centers[rng.integers(0, 1000, n)]
           + 0.35 * rng.normal(size=(n, d))).astype(np.float32)
    labels = rng.uniform(size=n)
    qs = (centers[rng.integers(0, 1000, NQ)]
          + 0.35 * rng.normal(size=(NQ, d))).astype(np.float32)
    return rng, pts, labels, qs


def timed_search(fn):
    fn()  # warm
    best, out = 1e9, None
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, best


# --------------------------------------------------------------------------
def phase_bench200k():
    from rangefilteredann_tpu import (
        BuildParams, RangeFilterTreeIndex, SuperOptimizedPostfilterTree)
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)

    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, 128)).astype(np.float32)
    assign = rng.integers(0, 1000, size=200_000)
    points = (centers[assign]
              + 0.35 * rng.normal(size=(200_000, 128))).astype(np.float32)
    labels = rng.uniform(size=200_000)
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    t0 = time.time()
    PostfilterVamanaIndex(points, labels, bp)
    log(f"bench200k: flat graph {time.time()-t0:.0f}s")
    t0 = time.time()
    RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                         build_params=bp)
    log(f"bench200k: B-WST rows {time.time()-t0:.0f}s")
    t0 = time.time()
    SuperOptimizedPostfilterTree(points, labels, cutoff=1000,
                                 split_factor=2.0, shift_factor=0.5,
                                 build_params=bp)
    log(f"bench200k: super rows {time.time()-t0:.0f}s")


# --------------------------------------------------------------------------
def phase_m1_protocol():
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    rng, points, labels, queries = make_1m()
    bp = BuildParams(R=64, L=500, alpha=1.2, cache_path="bench_cache/")
    t0 = time.time()
    idx = PostfilterVamanaIndex(points, labels, bp)
    log(f"m1: R=64 L=500 build/load: {(time.time()-t0)/60:.1f} min "
        f"(inline dtype: {getattr(idx._graph, 'inline_dtype', None)})")
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    frac = 0.25
    lo = rng.uniform(0, 1 - frac, NQ)
    filters = np.stack([lo, lo + frac], 1)
    ids_gt, _ = pre.batch_search(queries, filters, NQ,
                                 build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]
    _, dt = timed_search(lambda: pre.batch_search(
        queries, filters, NQ, build_query_params(K, K)))
    log(f"m1: prefilter exact 2^-2 qps={NQ/dt:.0f}")
    rows = []
    for beam, fm in ((40, 2), (80, 2), (80, 4), (160, 2), (160, 4)):
        qp = build_query_params(K, beam, final_beam_multiply=fm)
        (ids, _), dt = timed_search(
            lambda qp=qp: idx.batch_search(queries, filters, NQ, qp))
        rec = recall_of(ids, gt_sets)
        log(f"m1: R64L500 2^-2 beam={beam} fm={fm}: recall={rec:.4f} "
            f"qps={NQ/dt:.0f}")
        rows.append(f"2pow-2,postfiltering-R64L500_{beam}_{fm},{rec:.4f},"
                    f"{dt/NQ:.8f},{NQ/dt:.1f},1")
        if rec >= 0.995 and beam >= 80:
            break
    with open("results/protocol_1m_r64l500.csv", "w") as f:
        f.write("filter_width,method,recall,average_time,qps,threads\n")
        f.write("\n".join(rows) + "\n")


# --------------------------------------------------------------------------
def phase_deep10m():
    from night_10m import make_data

    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    CACHE = "bench_cache/deep10m_l2/"
    DATA_DIR = "/tmp/night10m_data"
    os.makedirs(DATA_DIR, exist_ok=True)
    log("deep10m: loading 10M points (seed 23)...")
    points, labels, queries, f2, f6 = make_data()
    filt = {2: f2, 6: f6}
    gt = {}
    gt_files = {f: f"{DATA_DIR}/gt{f}_ids.npy" for f in (2, 6)}
    if all(os.path.exists(p) for p in gt_files.values()):
        for fexp in (2, 6):
            gt[fexp] = [set(r.astype(np.int64).tolist())
                        for r in np.load(gt_files[fexp])]
        log("deep10m: GT loaded from cache")
    else:
        pre = PrefilterIndex(points, labels, metric="l2")
        qp10 = build_query_params(K, K)
        for fexp in (2, 6):
            (ids_gt, _), dt = timed_search(lambda f=fexp: pre.batch_search(
                queries, filt[f], NQ, qp10))
            log(f"deep10m: GT 2^-{fexp} exact prefilter qps={NQ/dt:.0f}")
            gt[fexp] = [set(r.astype(np.int64).tolist()) for r in ids_gt]
            np.save(gt_files[fexp], ids_gt)
        del pre
        gc.collect()
        log("deep10m: GT done")

    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path=CACHE)
    t0 = time.time()
    idx = PostfilterVamanaIndex(points, labels, bp, metric="l2")
    log(f"deep10m: flat L2 graph build/load: {(time.time()-t0)/60:.1f} min")
    rows = []
    for fexp, beams in ((2, (40, 80, 160, 320, 640)), (6, (40, 80, 160, 320))):
        for beam in beams:
            qp = build_query_params(K, beam, final_beam_multiply=2)
            (ids, _), dt = timed_search(
                lambda qp=qp, f=fexp: idx.batch_search(
                    queries, filt[f], NQ, qp))
            rec = recall_of(ids, gt[fexp])
            log(f"deep10m: 2^-{fexp} flat beam={beam} fm=2: "
                f"recall={rec:.4f} qps={NQ/dt:.0f}")
            rows.append(f"2pow-{fexp},postfiltering_{beam}_2,{rec:.4f},"
                        f"{dt/NQ:.8f},{NQ/dt:.1f},1")
            if rec >= 0.95:
                break
    with open("results/deep10m_l2_r3.csv", "w") as f:
        f.write("filter_width,method,recall,average_time,qps,threads\n")
        f.write("\n".join(rows) + "\n")
    del idx
    gc.collect()


# --------------------------------------------------------------------------
def phase_m1_tree():
    from rangefilteredann_tpu import BuildParams, RangeFilterTreeIndex

    _, points, labels, _ = make_1m()
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    t0 = time.time()
    tree = RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                                build_params=bp)
    log(f"m1_tree: all {len(tree._offsets)} rows build/load: "
        f"{(time.time()-t0)/60:.1f} min")


# --------------------------------------------------------------------------
def phase_m1_grid():
    """Reference-style sweep (run_our_method grids + early stop) at 1M."""
    from rangefilteredann_tpu import (
        BuildParams, RangeFilterTreeIndex, build_query_params)
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    rng, points, labels, queries = make_1m()
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    idx = PostfilterVamanaIndex(points, labels, bp)

    qp10 = build_query_params(K, K)
    out = "results/run_1m_r3.csv"
    rows = ["filter_width,method,recall,average_time,qps,threads"]
    BEAMS = (10, 20, 40, 80, 160, 320)
    FMS = (1, 2, 4)
    pre_qps = {}

    # Resume: seed from a prior run's CSV so a restarted session never
    # re-measures a (fraction, family) pair it already committed. Pass 1
    # writes the file only after finishing a fraction, so per-(fexp,
    # family) granularity is consistent.
    done = set()
    if os.path.exists(out):
        with open(out) as f:
            old = [ln.rstrip("\n") for ln in f if ln.strip()]
        if old and old[0].startswith("filter_width"):
            rows.extend(old[1:])
            # A (fexp, family) is done only if its recorded sweep actually
            # ENDED (recall>=0.999, the full grid exhausted, or the plateau
            # rule fired on its last row) — a sweep cut short by a transient
            # tunnel error must be re-attempted on resume (round-3 advisor).
            from collections import defaultdict

            fam_rows = defaultdict(list)  # CSV order == sweep order
            for ln in old[1:]:
                cols = ln.split(",")
                fexp_d = int(cols[0].split("-")[1])
                fam = cols[1].split("_")[0]
                if fam == "prefiltering":  # single-row: present == complete
                    done.add((fexp_d, fam))
                    pre_qps[fexp_d] = float(cols[4])
                    continue
                parts = cols[1].split("_")
                fam_rows[(fexp_d, fam)].append(
                    (int(parts[1]), int(parts[2]) if len(parts) > 2 else 1,
                     float(cols[2]), float(cols[4])))
            for key, rs in fam_rows.items():
                best_before_last = max(
                    (r[2] for r in rs[:-1]), default=0.0)
                beam_l, fm_l, rec_l, qps_l = rs[-1]
                ended = (
                    rec_l >= 0.999
                    or (beam_l >= BEAMS[-1] and fm_l >= FMS[-1])
                    or (rec_l < best_before_last + 0.001
                        and qps_l < pre_qps.get(key[0], 0.0)))
                if ended:
                    done.add(key)
                else:
                    log(f"m1_grid: sweep 2^-{key[0]} {key[1]} looks "
                        f"interrupted (last row beam={beam_l} fm={fm_l} "
                        f"rec={rec_l:.4f}) — will re-run")
            log(f"m1_grid: resuming past {len(old) - 1} recorded rows")

    def sweep(tag_fmt, fn_of, fexp, gt_sets, max_beam=320):
        """Reference early-stop (run_our_method.py:187-207): stop raising
        beam on recall ~1, plateau, or slower-than-prefilter."""
        best_rec = 0.0
        for beam in BEAMS:
            if beam > max_beam:
                break
            stop = False
            for fm in FMS:
                try:
                    qp = build_query_params(K, beam, final_beam_multiply=fm)
                    (ids, d), dt = timed_search(
                        lambda qp=qp: fn_of(qp))
                    rec = np.mean([
                        (len(gt_sets[q]
                             & set(ids[q][d[q] < FMAX].astype(np.int64)
                                   .tolist())) / len(gt_sets[q]))
                        if gt_sets[q] else 1.0 for q in range(NQ)])
                    rows.append(f"2pow-{fexp},{tag_fmt}_{beam}_{fm},"
                                f"{rec:.4f},{dt/NQ:.8f},{NQ/dt:.1f},1")
                    log(f"m1_grid 2^-{fexp} {tag_fmt}_{beam}_{fm}: "
                        f"recall={rec:.4f} qps={NQ/dt:.0f}")
                    if rec >= 0.999:
                        stop = True
                        break
                    if rec < best_rec + 0.001 and NQ / dt < pre_qps[fexp]:
                        stop = True  # plateaued below prefilter speed
                        break
                    best_rec = max(best_rec, rec)
                except Exception:
                    log(f"m1_grid {tag_fmt}_{beam} 2^-{fexp} FAILED\n"
                        + traceback.format_exc())
                    stop = True
                    break
            if stop:
                break

    # deterministic per-fraction filters/GT shared by both passes
    frac_data = {}
    for fexp in range(0, 17):
        frac = 2.0 ** -fexp
        lo = (rng.uniform(0, 1 - frac, NQ) if frac < 1
              else np.zeros(NQ))
        frac_data[fexp] = np.stack([lo, lo + frac], 1)

    def gt_for(fexp):
        ids_gt, d_gt = pre.batch_search(queries, frac_data[fexp], NQ, qp10)
        return [set(ids_gt[q][d_gt[q] < FMAX].astype(np.int64).tolist())
                for q in range(NQ)]

    # pass 1: prefilter rows + flat postfiltering (inline blocks resident)
    gts = {}
    for fexp in range(0, 17):
        want_flat = fexp <= 6 and (fexp, "postfiltering") not in done
        if (fexp, "prefiltering") in done and not want_flat:
            continue  # fully recorded by a prior run
        if left_min() < 25:
            log("m1_grid: deadline squeeze — stopping pass 1")
            break
        filters = frac_data[fexp]
        if (fexp, "prefiltering") not in done:
            gts[fexp] = gt_for(fexp)
            (ids, d), dt = timed_search(lambda: pre.batch_search(
                queries, filters, NQ, qp10))
            pre_qps[fexp] = NQ / dt
            rows.append(f"2pow-{fexp},prefiltering,1.0000,{dt/NQ:.8f},"
                        f"{NQ/dt:.1f},1")
            log(f"m1_grid 2^-{fexp} prefiltering: qps={NQ/dt:.0f}")
        if want_flat:
            if fexp not in gts:
                gts[fexp] = gt_for(fexp)
            sweep("postfiltering", lambda qp, f=filters: idx.batch_search(
                queries, f, NQ, qp), fexp, gts[fexp])
        with open(out, "w") as f:
            f.write("\n".join(rows) + "\n")

    # pass 2: tree methods (drop the flat inline blocks to make HBM room).
    # The 1M tree build is ~80 min cold (round-2 measured) and the per-
    # fraction gates below only fire AFTER it — gate the build itself,
    # unless the deepest row cache exists (warm load is minutes, not 80).
    tree_cached = bool(glob.glob(
        os.path.join("bench_cache", "wst_*_1000000_2_1000_row10.npz")))
    gate = 40 if tree_cached else 95
    if left_min() < gate:
        log(f"m1_grid: {left_min():.0f} min left < {gate} — skipping pass 2 "
            f"(tree row caches {'warm' if tree_cached else 'cold'})")
        with open(out, "w") as f:
            f.write("\n".join(rows) + "\n")
        return
    idx._graph.nbr_vecs = None
    idx._graph.nbr_norms = None
    idx._graph.nbr_scale = None
    gc.collect()
    tree = RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                                build_params=bp)
    tree_fams = (("vamana-tree", "fenwick"),
                 ("optimized-postfiltering", "optimized_postfilter"),
                 ("three-split", "three_split"))
    for fexp in range(0, 17):
        pending = [t for t, _ in tree_fams if (fexp, t) not in done]
        if not pending:
            continue
        if left_min() < 15:
            log("m1_grid: deadline squeeze — stopping pass 2")
            break
        if fexp not in gts:
            gts[fexp] = gt_for(fexp)
            pre_qps.setdefault(fexp, 1e9)
        filters = frac_data[fexp]
        for tag, method in tree_fams:
            if tag not in pending:
                continue
            sweep(tag, lambda qp, f=filters, m=method: tree.batch_search(
                queries, f, NQ, m, qp), fexp, gts[fexp])
        with open(out, "w") as f:
            f.write("\n".join(rows) + "\n")
    log(f"m1_grid: wrote {out}")


# --------------------------------------------------------------------------
def phase_mips1m():
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

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
    bp = BuildParams(R=64, L=200, alpha=1.2,
                     cache_path="bench_cache/mips1m/")
    t0 = time.time()
    idx = PostfilterVamanaIndex(pts, labels, bp, metric="mips")
    log(f"mips1m: R=64 L=200 MIPS build/load: {(time.time()-t0)/60:.1f} min")
    pre = PrefilterIndex(pts, labels, metric="mips")
    rows = ["filter_width,method,recall,average_time,qps,threads"]
    qp10 = build_query_params(K, K)
    for fexp in (2, 4, 6):
        frac = 2.0 ** -fexp
        lo = rng.uniform(0, 1 - frac, NQ)
        filters = np.stack([lo, lo + frac], 1)
        ids_gt, _ = pre.batch_search(qs, filters, NQ, qp10)
        gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]
        _, dt = timed_search(lambda: pre.batch_search(qs, filters, NQ, qp10))
        rows.append(f"2pow-{fexp},prefiltering,1.0000,{dt/NQ:.8f},"
                    f"{NQ/dt:.1f},1")
        log(f"mips1m 2^-{fexp} prefiltering qps={NQ/dt:.0f}")
        for beam, fm in ((80, 2), (160, 2), (320, 2), (320, 4)):
            qp = build_query_params(K, beam, final_beam_multiply=fm)
            (ids, _), dt = timed_search(
                lambda qp=qp: idx.batch_search(qs, filters, NQ, qp))
            rec = recall_of(ids, gt_sets)
            rows.append(f"2pow-{fexp},postfiltering-mips_{beam}_{fm},"
                        f"{rec:.4f},{dt/NQ:.8f},{NQ/dt:.1f},1")
            log(f"mips1m 2^-{fexp} beam={beam} fm={fm}: recall={rec:.4f} "
                f"qps={NQ/dt:.0f}")
            if rec >= 0.95:
                break
        with open("results/landscape_1m_mips.csv", "w") as f:
            f.write("\n".join(rows) + "\n")
    log("mips1m: wrote results/landscape_1m_mips.csv")


# --------------------------------------------------------------------------
def phase_deep10m_tree():
    from night_10m import make_data

    from rangefilteredann_tpu import (
        BuildParams, RangeFilterTreeIndex, build_query_params)

    CACHE = "bench_cache/deep10m_l2/"
    DATA_DIR = "/tmp/night10m_data"
    os.makedirs(DATA_DIR, exist_ok=True)
    points, labels, queries, f2, f6 = make_data()
    filt = {2: f2, 6: f6}
    gt = {}
    for fexp in (2, 6):
        p = f"{DATA_DIR}/gt{fexp}_ids.npy"
        if not os.path.exists(p):  # deep10m phase failed/skipped: recompute
            from rangefilteredann_tpu.models.prefilter import PrefilterIndex

            pre = PrefilterIndex(points, labels, metric="l2")
            qp10 = build_query_params(K, K)
            for fe in (2, 6):
                ids_gt, _ = pre.batch_search(queries, filt[fe], NQ, qp10)
                np.save(f"{DATA_DIR}/gt{fe}_ids.npy", ids_gt)
            del pre
            gc.collect()
            break
    for fexp in (2, 6):
        gt[fexp] = [set(r.astype(np.int64).tolist())
                    for r in np.load(f"{DATA_DIR}/gt{fexp}_ids.npy")]
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path=CACHE)
    t0 = time.time()
    tree = RangeFilterTreeIndex(
        points, labels, cutoff=5_000_000, split_factor=2, build_params=bp,
        metric="l2", device_rows_budget=4 << 30)
    log(f"deep10m_tree: 2-row B-WST build/load: {(time.time()-t0)/60:.1f} "
        f"min (residency budget 4 GiB)")
    for method in ("optimized_postfilter", "fenwick"):
        for fexp in (2, 6):
            for beam in (80, 160):
                qp = build_query_params(K, beam, final_beam_multiply=2)
                (ids, _), dt = timed_search(
                    lambda qp=qp, f=fexp, m=method: tree.batch_search(
                        queries, filt[f], NQ, m, qp))
                rec = recall_of(ids, gt[fexp])
                log(f"deep10m_tree: 2^-{fexp} {method} beam={beam}: "
                    f"recall={rec:.4f} qps={NQ/dt:.0f}")
                if rec >= 0.95:
                    break


# --------------------------------------------------------------------------
# Estimates recalibrated from measured round-2 builds (docs/PERFORMANCE.md:
# 1M R48/L100 750 s, 1M R64/L200 15 min, 1M B-WST rows 82 min, 10M R48/L100
# 133-164 min, 200k bench caches 33 min). Machine reset wiped every cache,
# so all builds are cold. m1_tree is subsumed by m1_grid (which builds the
# tree itself and degrades gracefully per fraction).
PHASES = [
    ("bench200k", phase_bench200k, 40),
    ("m1_protocol", phase_m1_protocol, 65),
    ("deep10m", phase_deep10m, 180),
    ("mips1m", phase_mips1m, 40),
    ("m1_grid", phase_m1_grid, 75),
    ("deep10m_tree", phase_deep10m_tree, 150),
    ("m1_tree", phase_m1_tree, 85),
]

if __name__ == "__main__":
    only = set(sys.argv[1:])  # optional phase-name filter
    log(f"r3_night start; deadline in {left_min():.0f} min")
    for name, fn, est in PHASES:
        if only and name not in only:
            continue
        if left_min() < est * 0.9:
            log(f"=== phase {name} SKIPPED ({left_min():.0f} min left < "
                f"est {est}) ===")
            continue
        for attempt in (1, 2):
            log(f"=== phase {name} (est {est} min, {left_min():.0f} left, "
                f"attempt {attempt}) ===")
            t0 = time.time()
            try:
                fn()
                log(f"=== phase {name} done in "
                    f"{(time.time()-t0)/60:.1f} min ===")
                break
            except Exception:
                tb = traceback.format_exc()
                log(f"=== phase {name} FAILED after "
                    f"{(time.time()-t0)/60:.1f} min ===\n{tb}")
                scrub_device()
                # one retry, only for device-memory failures (caches make
                # the second attempt resume where the first died)
                if "RESOURCE_EXHAUSTED" not in tb or attempt == 2:
                    break
        scrub_device()
    log("r3_night done")

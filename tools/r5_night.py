"""Round-5 runner: ONE TPU process for every long build/measurement of the
round (machine reset again wiped bench_cache/ except the 200k flat graph,
which the driver bench rebuilt).

Phases, priority-ordered by bench-evidence per minute (each deadline-gated,
each independent, all caches resumable):

  rows200k    200k B-WST rows            -> bench fenwick/opt/three-split
  pallas_ab   post-retry Pallas beam A/B -> results/pallas_ab_r5.csv
              (VERDICT-r4 #2: the decisive readout the reset killed)
  super200k   200k super rows            -> bench super family
  m1_protocol 1M R=64/L=500 flat graph   -> bench 1m postfilter family
  adv1m       adversarial config #5 run  -> results/adversarial_1m.csv
  super1m     super tree at 1M           -> results/super_1m_r5.csv
  m1_tree     1M B-WST rows              -> bench 1m fenwick family
  ab1m        Pallas beam A/B at 1M int8 -> appended to pallas_ab_r5.csv
  warm200k    bench.py query shapes      -> .jax_cache for the driver bench

Run: nohup setsid env R5N_DEADLINE=<epoch> python tools/r5_night.py \
         > /tmp/r5_night.log 2>&1 &
Default deadline: now + 10 h.
"""

import gc
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

DEADLINE = float(os.environ.get("R5N_DEADLINE", time.time() + 10 * 3600))
os.environ.setdefault("R3_DEADLINE", str(DEADLINE))  # shared tool deadline
os.environ.setdefault("S1M_DEADLINE", str(DEADLINE))

from r3_night import make_1m, recall_of, scrub_device, timed_search  # noqa: E402

K, NQ = 10, 10240  # bench.py protocol batch size
AB_CSV = "results/pallas_ab_r5.csv"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}] [{left_min():+.0f}m]", *a,
          flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def make_200k():
    """EXACT rng stream of bench.py main() (cache fingerprints)."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, 128)).astype(np.float32)
    assign = rng.integers(0, 1000, size=200_000)
    points = (centers[assign]
              + 0.35 * rng.normal(size=(200_000, 128))).astype(np.float32)
    labels = rng.uniform(size=200_000)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + 0.35 * rng.normal(size=(NQ, 128))).astype(np.float32)
    starts = rng.uniform(0, 0.75, size=NQ)
    filters = np.stack([starts, starts + 0.25], axis=1)
    return points, labels, queries, filters


# --------------------------------------------------------------------------
def phase_rows200k():
    from rangefilteredann_tpu import BuildParams, RangeFilterTreeIndex

    points, labels, _, _ = make_200k()
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    t0 = time.time()
    RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                         build_params=bp)
    log(f"rows200k: B-WST rows {(time.time()-t0)/60:.1f} min")


# --------------------------------------------------------------------------
def phase_super200k():
    from rangefilteredann_tpu import BuildParams, SuperOptimizedPostfilterTree

    points, labels, _, _ = make_200k()
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    t0 = time.time()
    SuperOptimizedPostfilterTree(points, labels, cutoff=1000,
                                 split_factor=2.0, shift_factor=0.5,
                                 build_params=bp)
    log(f"super200k: super rows {(time.time()-t0)/60:.1f} min")


# --------------------------------------------------------------------------
def _ab_rows(idx, queries, filters, nq, gt_sets, beams, fms, scale_tag):
    """A/B one index XLA-vs-Pallas, appending CSV rows to AB_CSV."""
    import rangefilteredann_tpu.ops.beam_search as bs
    from rangefilteredann_tpu import build_query_params

    header = ("scale,beam,fm,xla_qps,xla_recall,pallas_qps,pallas_recall,"
              "speedup,ids_agree")
    rows = []
    if os.path.exists(AB_CSV):
        with open(AB_CSV) as f:
            rows = [ln.rstrip("\n") for ln in f if ln.strip()]
    if not rows:
        rows = [header]
    for beam in beams:
        for fm in fms:
            if left_min() < 4:
                log("pallas_ab: deadline squeeze")
                break
            qp = build_query_params(K, beam, final_beam_multiply=fm)
            res = {}
            for pallas in (False, True):
                bs.PALLAS_BEAM = pallas
                (ids, _), dt = timed_search(
                    lambda qp=qp: idx.batch_search(queries, filters, nq, qp))
                res[pallas] = (nq / dt, recall_of(ids, gt_sets), ids.copy())
            bs.PALLAS_BEAM = bool(int(os.environ.get("RFANN_PALLAS_BEAM",
                                                     "0")))
            (q0, r0, i0), (q1, r1, i1) = res[False], res[True]
            agree = float((i0 == i1).mean())
            log(f"ab {scale_tag} beam={beam} fm={fm}: xla {q0:7.0f} r={r0:.4f}"
                f" | pallas {q1:7.0f} r={r1:.4f} | {q1/q0:4.2f}x "
                f"agree={agree:.4f}")
            rows.append(f"{scale_tag},{beam},{fm},{q0:.1f},{r0:.4f},"
                        f"{q1:.1f},{r1:.4f},{q1/q0:.3f},{agree:.4f}")
            with open(AB_CSV, "w") as f:
                f.write("\n".join(rows) + "\n")


def phase_pallas_ab():
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    points, labels, queries, filters = make_200k()
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/"),
        require_cache=True)
    log("pallas_ab: 200k graph loaded; inline:", idx._graph.inline_dtype)
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    gt_ids, _ = pre.batch_search(queries, filters, NQ,
                                 build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
    del pre
    gc.collect()
    _ab_rows(idx, queries, filters, NQ, gt_sets,
             beams=(10, 20, 40, 80, 160, 320), fms=(2, 4), scale_tag="200k")


def phase_ab1m():
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    rng, points, labels, queries = make_1m()
    frac = 0.25
    lo = rng.uniform(0, 1 - frac, queries.shape[0])
    filters = np.stack([lo, lo + frac], 1)
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=64, L=500, alpha=1.2, cache_path="bench_cache/"),
        require_cache=True)
    log("ab1m: 1M graph loaded; inline:", idx._graph.inline_dtype)
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    nq = queries.shape[0]
    gt_ids, _ = pre.batch_search(queries, filters, nq,
                                 build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
    del pre
    gc.collect()
    _ab_rows(idx, queries, filters, nq, gt_sets,
             beams=(40, 80, 160), fms=(2,), scale_tag="1m")


# --------------------------------------------------------------------------
def phase_m1_protocol():
    from r3_night import phase_m1_protocol as p

    p()


def phase_adv1m():
    import adversarial_1m

    adversarial_1m.main()


def phase_super1m():
    import super1m

    super1m.main()


def phase_m1_tree():
    from r3_night import phase_m1_tree as p

    p()


# --------------------------------------------------------------------------
def phase_warm200k():
    """Compile-warm the exact query shapes bench.py times (NQ=10240), so the
    driver's bench run pays zero cold compiles. Most-valuable shapes first;
    every step deadline-gated."""
    from rangefilteredann_tpu import (
        BuildParams, RangeFilterTreeIndex, SuperOptimizedPostfilterTree,
        build_query_params)
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)

    points, labels, queries, filters = make_200k()
    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    warm = []
    try:
        tree = RangeFilterTreeIndex(points, labels, cutoff=1000,
                                    split_factor=2, build_params=bp,
                                    require_cache=True)
        for method in ("fenwick", "optimized_postfilter", "three_split"):
            for beam in (40, 80):
                qp = build_query_params(K, beam, final_beam_multiply=2)
                warm.append((f"tree-{method} beam={beam}",
                             lambda m=method, q=qp: tree.batch_search(
                                 queries, filters, NQ, m, q)))
    except FileNotFoundError:
        log("warm200k: tree rows absent, skipping tree warms")
    try:
        sup = SuperOptimizedPostfilterTree(
            points, labels, cutoff=1000, split_factor=2.0, shift_factor=0.5,
            build_params=bp, require_cache=True)
        for beam in (40, 80):
            qp = build_query_params(K, beam, final_beam_multiply=2)
            warm.append((f"super beam={beam}",
                         lambda q=qp: sup.batch_search(queries, filters,
                                                       NQ, q)))
    except FileNotFoundError:
        log("warm200k: super rows absent, skipping super warms")
    idx = PostfilterVamanaIndex(points, labels, bp, require_cache=True)
    for fm in (2, 4):
        for beam in (40, 80, 160, 20, 10, 320):
            qp = build_query_params(K, beam, final_beam_multiply=fm)
            warm.append((f"postfilter beam={beam} fm={fm}",
                         lambda q=qp: idx.batch_search(queries, filters,
                                                       NQ, q)))
    for name, fn in warm:
        if left_min() < 3:
            log(f"warm200k: deadline — stopping before {name}")
            break
        t0 = time.time()
        fn()
        log(f"warm {name}: {time.time()-t0:.1f}s")


# --------------------------------------------------------------------------
PHASES = [
    ("rows200k", phase_rows200k, 40),
    ("pallas_ab", phase_pallas_ab, 35),
    ("super200k", phase_super200k, 70),
    ("m1_protocol", phase_m1_protocol, 55),
    ("adv1m", phase_adv1m, 115),
    ("super1m", phase_super1m, 95),
    ("m1_tree", phase_m1_tree, 90),
    ("ab1m", phase_ab1m, 25),
    ("warm200k", phase_warm200k, 25),
]

if __name__ == "__main__":
    only = set(sys.argv[1:])
    log(f"r5_night start; deadline in {left_min():.0f} min")
    for name, fn, est in PHASES:
        if only and name not in only:
            continue
        # warm200k runs whenever ANY time is left (it self-gates per shape)
        gate = 5 if name == "warm200k" else est * 0.9
        if left_min() < gate:
            log(f"=== phase {name} SKIPPED ({left_min():.0f} min left < "
                f"{gate:.0f}) ===")
            continue
        for attempt in (1, 2):
            log(f"=== phase {name} (est {est} min, attempt {attempt}) ===")
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
                if "RESOURCE_EXHAUSTED" not in tb or attempt == 2:
                    break
        scrub_device()
    log("r5_night done")

"""Benchmark: QPS at recall@10 >= 0.9, filter fraction 2^-2, best method
(BASELINE.md config #1 shape: SIFT-like fp32 L2 vectors, uniform labels,
k=10, 10k-query batches like the reference protocol).

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...,
   "families": {per-family best QPS + recall}}

vs_baseline divides by BASELINE_CPU_QPS, an order-of-magnitude estimate of
the reference's multicore-CPU QPS at recall 0.9 for this config (the repo
publishes no absolute numbers — BASELINE.md: "published: {}"; the paper's
SIFT Pareto fronts at fraction 2^-2 sit around 1e5 QPS at recall 0.9 on a
large multicore box). The north-star target is vs_baseline >= 10.

Every family is timed as best-of-N (N>=2) after an untimed warm-up — the
shared-pool tunnel drifts up to ~1.5x between runs, and min is the stable
statistic (round-1 verdict item 9).

The built graph is cached under bench_cache/ and XLA compilations under
.jax_cache/, so steady-state bench runs measure query throughput, not builds.
"""

import gc
import json
import os
import sys
import time

import numpy as np

# the 1M R=64 int8 inline slab is 8.2 GB; the default 7 GB budget would
# silently skip the attach (set before the package import reads it)
os.environ.setdefault("RFANN_INLINE_BUDGET", "9.5e9")
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rangefilteredann_tpu import (
    BuildParams,
    RangeFilterTreeIndex,
    SuperOptimizedPostfilterTree,
    build_query_params,
)
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex

N = 200_000
D = 128
K = 10
FRACTION = 2.0**-2
NQ = 10240  # reference protocol uses 10,000-query batches (run_our_method.py)
BASELINE_CPU_QPS = 1.0e5
BEAMS = [10, 20, 40, 80, 160, 320]
FINAL_MULTIPLIES = [2, 4]
CLUSTERS = 1000  # SIFT-like cluster structure (isotropic gaussian is a
#                  pathological ANN instance that no real workload resembles)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Families skipped for ANY reason (missing caches, failures) are reported in
# the output JSON as `skipped_families` — a partial bench must never read as
# a complete one (round-3 verdict weak #4).
SKIPPED = []


def skip(family, reason):
    SKIPPED.append({"family": family, "reason": reason})
    log(f"SKIP {family}: {reason}")


class _FetchMeter:
    """Counts blocking jax.device_get round trips during a timed region.

    Each blocking fetch over the remote tunnel pays a ~30 ms dispatch floor
    regardless of payload (CLAUDE.md "Tunnel economics"); on co-located
    hardware the same sync costs ~50 us. Counting the round trips lets the
    bench report a per-family device-resident QPS *estimate*:
    NQ / (t_e2e - rtts * floor). Kernel time is untouched (the floor is
    measured on an empty queue with a scalar payload), so the estimate is
    conservative — real transfer bytes still count against device time.
    """

    def __init__(self):
        self.calls = 0
        self._orig = None

    def install(self):
        self._orig = jax.device_get
        meter = self

        def counted(x):
            meter.calls += 1
            return meter._orig(x)

        jax.device_get = counted

    def floor_seconds(self, reps=8):
        import jax.numpy as jnp

        tiny = jnp.zeros((8,), jnp.int32)
        tiny.block_until_ready()
        self._orig(tiny)  # warm path
        t0 = time.time()
        for _ in range(reps):
            self._orig(tiny)
        return (time.time() - t0) / reps


METER = _FetchMeter()
TUNNEL_FLOOR = 0.0  # measured at startup on TPU


def best_of(fn, reps):
    """Untimed warm-up, then min over `reps` timed runs (tunnel drift)."""
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def best_of_metered(fn, reps):
    """best_of + the fetch-round-trip count of the best run."""
    fn()
    best, rtts = np.inf, 0
    for _ in range(reps):
        METER.calls = 0
        t0 = time.time()
        fn()
        dt = time.time() - t0
        if dt < best:
            best, rtts = dt, METER.calls
    return best, rtts


def device_est(nq, dt, rtts):
    """Device-resident QPS estimate: e2e time minus the tunnel dispatch
    floor paid once per blocking fetch (host round trips that orchestrate
    the search — doubling decisions, result fetches — are algorithmic, but
    their ~30 ms floor each is this environment's tunnel, not the chip)."""
    return nq / max(dt - rtts * TUNNEL_FLOOR, 1e-9)


# Nominal dense-matmul peak by device kind, for the MFU line (bf16 MXU
# peak; fp32 at precision=HIGHEST runs ~6 bf16 passes). Unknown kinds
# report effective TFLOP/s with mfu=null.
PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def main():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(CLUSTERS, D)).astype(np.float32)
    assign = rng.integers(0, CLUSTERS, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    q_assign = rng.integers(0, CLUSTERS, size=NQ)
    queries = (centers[q_assign] + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)
    width = FRACTION
    starts = rng.uniform(0, 1 - width, size=NQ)
    filters = np.stack([starts, starts + width], axis=1)

    t0 = time.time()
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/"),
    )
    log(f"build/load: {time.time() - t0:.1f}s")

    # exact GT on device via the prefilter scan (fast, exact)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex
    gt_idx = PrefilterIndex(points, labels, metric="Euclidian")
    gt_ids, _ = gt_idx.batch_search(queries, filters, NQ, build_query_params(K, K))
    gt_sets = [set(row.astype(np.int64).tolist()) for row in gt_ids]

    def recall_of(ids):
        return float(np.mean([
            len(gt_sets[i] & set(ids[i].astype(np.int64).tolist())) / K
            for i in range(NQ)
        ]))

    families = {}
    kernels = {}  # per-kernel effective-FLOPs / MFU diagnostics
    on_tpu = jax.default_backend() != "cpu"
    global TUNNEL_FLOOR
    if on_tpu:
        METER.install()
        TUNNEL_FLOOR = METER.floor_seconds()
        log(f"tunnel fetch floor: {TUNNEL_FLOOR*1e3:.1f} ms/round-trip")

    def record(family, qps, recall, cfg, dt=None, rtts=None):
        fam = families.setdefault(family, {"qps": 0.0, "recall": 0.0})
        if recall >= 0.9 and qps > fam["qps"]:
            fam.update(qps=round(qps, 1), recall=round(recall, 4), config=cfg)
            if dt is not None and rtts is not None and on_tpu:
                fam["device_qps_est"] = round(device_est(NQ, dt, rtts), 1)
                fam["fetch_rtts"] = int(rtts)

    # --- exact prefiltering: a first-class method (recall 1.0 by
    # construction; the reference's methodology takes the best method per
    # recall threshold, ref: experiments/create_table.py:5-37) ---
    dt, rtts = best_of_metered(lambda: gt_idx.batch_search(
        queries, filters, NQ, build_query_params(K, K)), reps=7)
    log(f"prefilter (exact): recall=1.0 qps={NQ / dt:.0f}")
    record("prefilter", NQ / dt, 1.0, "exact", dt, rtts)

    # --- device-resident scan rate: queries staged in HBM, kernels launched
    # back-to-back (async dispatch), one sync at the end. This is the chip's
    # sustained exact-scan throughput with host<->device transfer amortized —
    # the regime of a production serving stack (the e2e number above instead
    # pays this environment's remote tunnel: ~110 MB/s uploads and a ~30 ms
    # floor per blocking fetch; see CLAUDE.md "Tunnel economics"). ---
    device_qps = 0.0
    import jax as _jax
    if _jax.default_backend() not in ("cpu",):
        import jax.numpy as jnp
        from rangefilteredann_tpu.ops.pallas_scan import (
            host_max_tiles, pallas_scan_bruteforce)
        from rangefilteredann_tpu.utils.data import (
            first_geq, pad_dim, pad_queries)

        ps = gt_idx._ps
        labels_sorted = gt_idx._labels_sorted
        ss = first_geq(labels_sorted, filters[:, 0]).astype(np.int32)
        ee = first_geq(labels_sorted, filters[:, 1]).astype(np.int32)
        order = np.argsort(ss + ee, kind="stable")
        w_d = pad_dim(ps.d)  # same lane rule as launch_range_bruteforce
        qs = pad_queries(queries, ps.d, ps.d_pad)[order, :w_d]
        ss, ee = ss[order], ee[order]
        mt = host_max_tiles(ss, ee, ps.n, w_d=w_d)
        q_dev = jnp.asarray(qs)
        s_dev, e_dev = jnp.asarray(ss), jnp.asarray(ee)
        nc = ps.norm_col if ps.norm_col >= 0 else None

        def scan_once():
            return pallas_scan_bruteforce(
                ps.data, ps.norms_sq, q_dev, s_dev, e_dev, k=K,
                metric=ps.metric, d_eff=w_d, max_tiles=mt)
        scan_once()[0].block_until_ready()  # warm-up/compile
        REPS = 10
        best_dev = np.inf
        for _ in range(3):
            t0 = time.time()
            outs = [scan_once() for _ in range(REPS)]
            outs[-1][0].block_until_ready()
            best_dev = min(best_dev, (time.time() - t0) / REPS)
        device_qps = NQ / best_dev
        log(f"prefilter device-resident: qps={device_qps:.0f}")
        # scan-kernel MFU: useful work is sum(window widths) x 2D flops per
        # query batch (the kernel also computes masked tile lanes — counted
        # as overhead, not useful flops, so this is the honest/low number)
        scan_eff_tflops = float(np.sum(ee - ss)) * 2 * D / best_dev / 1e12
        kernels["scan"] = {
            "effective_tflops": round(scan_eff_tflops, 2),
            "note": "useful flops (window rows x 2D) / device-resident time",
        }
        # free the staged device query/window buffers now (a few MB each);
        # the big 200k staged arrays themselves are freed later via
        # `del gt_idx` before the 1M section's inline attach needs headroom
        del q_dev, s_dev, e_dev, outs
        # reported as its own JSON field, NOT a family: families are
        # deployable end-to-end methods; this is the chip capability number

    # --- flat beam-doubling postfiltering ---
    for fm in FINAL_MULTIPLIES:
        for beam in BEAMS:
            qp = build_query_params(K, beam, final_beam_multiply=fm)
            ids_box = {}

            def run(qp=qp, box=ids_box):
                box["ids"], _ = idx.batch_search(queries, filters, NQ, qp)

            dt, rtts = best_of_metered(run, reps=2)
            recall = recall_of(ids_box["ids"])
            log(f"beam={beam} fm={fm}: recall={recall:.4f} qps={NQ/dt:.0f}")
            record("postfilter", NQ / dt, recall, f"beam={beam},fm={fm}",
                   dt, rtts)

    # beam-kernel MFU at the family's winning config: one instrumented run
    # counts true distance comparisons (stats.h parity counters); useful
    # flops = dist_cmps x 2D
    if on_tpu and families.get("postfilter", {}).get("qps"):
        from rangefilteredann_tpu.utils.stats import QueryStats

        cfg = dict(p.split("=") for p in
                   families["postfilter"]["config"].split(","))
        qp = build_query_params(K, int(cfg["beam"]),
                                final_beam_multiply=int(cfg["fm"]))
        st = QueryStats(NQ)
        idx.batch_search(queries, filters, NQ, qp, stats=st)  # warm
        st.clear()
        t0 = time.time()
        idx.batch_search(queries, filters, NQ, qp, stats=st)
        dt_k = time.time() - t0
        kernels["beam"] = {
            "effective_tflops": round(
                float(st.distances.sum()) * 2 * D / dt_k / 1e12, 3),
            "dist_cmps_avg": round(float(st.distances.mean()), 1),
            "note": "useful flops (dist_cmps x 2D) / e2e time at best config",
        }

    # --- B-WST tree methods. When the row caches are missing (machine reset
    # wiped the gitignored bench_cache/ — rounds 4 and 5 both hit this), the
    # bench REBUILDS them inline, deadline-gated, BEFORE timing: cache-or-
    # build-on-construct like the reference (ref: src/postfilter_vamana.h:
    # 54-79), bounded so a driver bench run can't grow unboundedly. Budget
    # via RFANN_BENCH_BUILD_SECS (default 3600: B-WST rows ~34 min fit,
    # super rows ~65 min need an explicitly raised budget).
    from rangefilteredann_tpu.models.range_filter_tree import (
        build_offset_rows, row_cache_filename)
    from rangefilteredann_tpu.models.super_postfilter_tree import (
        super_row_cache_filename,
        super_row_layout,
    )

    tree_bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    build_deadline = time.time() + float(
        os.environ.get("RFANN_BENCH_BUILD_SECS", "3600"))

    def _tree_rows_cached():
        n_r = len(build_offset_rows(N, 1000, 2))
        # probe row 1 AND the last row: row 0 lives in the SHARED whole-
        # dataset vamana cache; a build killed mid-tree leaves early rows
        return all(os.path.exists(row_cache_filename(
            "bench_cache/", tree_bp, float(labels.min()),
            float(labels.max()), N, 2, 1000, r))
            for r in (1, n_r - 1))

    def _super_rows_cached():
        n_s = len(super_row_layout(N, 1000, 2.0, 0.5))
        return all(os.path.exists(super_row_cache_filename(
            "bench_cache/", tree_bp, float(labels.min()),
            float(labels.max()), N, 2.0, 0.5, 1000, r))
            for r in (1, n_s - 1))

    if on_tpu and not _tree_rows_cached() \
            and build_deadline - time.time() > 40 * 60:
        log("bench: rebuilding 200k B-WST row caches (~34 min)...")
        t0 = time.time()
        try:
            RangeFilterTreeIndex(points, labels, cutoff=1000, split_factor=2,
                                 build_params=tree_bp)
            log(f"bench: B-WST rows rebuilt in {(time.time()-t0)/60:.1f} min")
        except Exception as e:  # noqa: BLE001 — timing families must survive
            log(f"bench: B-WST row rebuild failed: {type(e).__name__}: {e}")
    if on_tpu and not _super_rows_cached() \
            and build_deadline - time.time() > 70 * 60:
        log("bench: rebuilding 200k super row caches (~65 min)...")
        t0 = time.time()
        try:
            SuperOptimizedPostfilterTree(
                points, labels, cutoff=1000, split_factor=2.0,
                shift_factor=0.5, build_params=tree_bp)
            log(f"bench: super rows rebuilt in {(time.time()-t0)/60:.1f} min")
        except Exception as e:  # noqa: BLE001
            log(f"bench: super row rebuild failed: {type(e).__name__}: {e}")
    if _tree_rows_cached():
        try:
            tree = RangeFilterTreeIndex(
                points, labels, cutoff=1000, split_factor=2,
                build_params=tree_bp, require_cache=True,
            )
            for method in ("fenwick", "optimized_postfilter", "three_split"):
                for beam in (40, 80):
                    qp = build_query_params(K, beam, final_beam_multiply=2)
                    box = {}

                    def run(method=method, qp=qp, box=box):
                        box["ids"], _ = tree.batch_search(
                            queries, filters, NQ, method, qp)

                    dt, rtts = best_of_metered(run, reps=2)
                    recall = recall_of(box["ids"])
                    log(f"tree-{method} beam={beam}: recall={recall:.4f} "
                        f"qps={NQ/dt:.0f}")
                    record(method, NQ / dt, recall, f"beam={beam},fm=2",
                           dt, rtts)
        except FileNotFoundError as e:
            skip("fenwick/optimized_postfilter/three_split",
                 f"tree cache unusable ({e})")
    else:
        skip("fenwick/optimized_postfilter/three_split", "row caches absent")

    if _super_rows_cached():
        try:
            sup = SuperOptimizedPostfilterTree(
                points, labels, cutoff=1000, split_factor=2.0,
                shift_factor=0.5, build_params=tree_bp, require_cache=True,
            )
            for beam in (40, 80):
                qp = build_query_params(K, beam, final_beam_multiply=2)
                box = {}

                def run(qp=qp, box=box):
                    box["ids"], _ = sup.batch_search(queries, filters, NQ, qp)

                dt, rtts = best_of_metered(run, reps=2)
                recall = recall_of(box["ids"])
                log(f"super beam={beam}: recall={recall:.4f} qps={NQ/dt:.0f}")
                record("super", NQ / dt, recall, f"beam={beam},fm=2",
                       dt, rtts)
        except FileNotFoundError as e:
            skip("super", f"super cache unusable ({e})")
    else:
        skip("super", "row caches absent")

    # --- 1M families (protocol scale; round-2 verdict weak #8): run only
    # when the night runner's caches exist so the driver bench stays bounded
    families_1m = {}
    try:
        if jax.default_backend() != "cpu":
            del idx
            if "tree" in dir():
                del tree
            if "sup" in dir():
                del sup
            del gt_idx
            gc.collect()
            families_1m = bench_1m(recall_of_k=K)
        else:
            skip("1m", "cpu backend")
    except Exception as e:  # noqa: BLE001 — the 200k headline must survive
        skip("1m", f"{type(e).__name__}: {e}")

    families_10m = {}
    try:
        if jax.default_backend() != "cpu":
            families_10m = bench_10m()
        else:
            skip("10m", "cpu backend")
    except Exception as e:  # noqa: BLE001
        skip("10m", f"{type(e).__name__}: {e}")

    families_12m = {}
    try:
        if jax.default_backend() != "cpu":
            families_12m = bench_12m()
        else:
            skip("12m", "cpu backend")
    except Exception as e:  # noqa: BLE001
        skip("12m", f"{type(e).__name__}: {e}")

    best_qps = max((f["qps"] for f in families.values()), default=0.0)
    # MFU vs the chip's nominal bf16 MXU peak (fp32-HIGHEST matmuls run
    # multiple bf16 passes, so real fp32 attainable is ~1/6 of this; the
    # pct is reported against bf16 peak for cross-round comparability)
    if kernels:
        peak = PEAK_BF16_TFLOPS.get(jax.devices()[0].device_kind)
        for kern in kernels.values():
            kern["mfu_pct_bf16_peak"] = (
                round(100 * kern["effective_tflops"] / peak, 2)
                if peak else None)
    out = {
        "metric": "qps_at_recall0.9_frac2pow-2_window200k_best_method",
        "value": best_qps,
        "unit": "qps",
        "vs_baseline": round(best_qps / BASELINE_CPU_QPS, 3),
        "families": families,
        "skipped_families": SKIPPED,
    }
    if kernels:
        out["kernels"] = kernels
        out["device_kind"] = jax.devices()[0].device_kind
        out["tunnel_floor_ms"] = round(TUNNEL_FLOOR * 1e3, 1)
    if device_qps:
        out["device_resident_qps"] = round(device_qps, 1)
        out["device_resident_vs_baseline"] = round(
            device_qps / BASELINE_CPU_QPS, 3)
    if families_1m:
        out["families_1m"] = families_1m
    if families_10m:
        out["families_10m"] = families_10m
    if families_12m:
        out["families_12m"] = families_12m
    print(json.dumps(out))


def bench_10m():
    """DEEP-10M-scale families (BASELINE config #3 shape). Runs ONLY when
    both the /tmp dataset cache (tools/night_10m.make_data) and the flat
    graph cache exist — regenerating 10M points takes ~25 min and a cold
    graph build ~150, far past the driver's bench budget."""
    import glob

    data_dir = "/tmp/night10m_data"
    names = ("points", "labels", "queries", "filters2")
    if not all(os.path.exists(f"{data_dir}/{n}.npy") for n in names):
        skip("10m", "dataset cache absent (/tmp/night10m_data)")
        return {}
    gc.collect()  # drop the 1M section's device buffers before 7 GB lands
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from night_10m import make_data

    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    k, nq = K, 2048  # 10M sweeps use the night runner's batch size
    points, labels, queries, f2, _ = make_data()
    filters = f2[:nq]
    queries = queries[:nq]
    out = {}
    pre = PrefilterIndex(points, labels, metric="l2")
    qp10 = build_query_params(k, k)
    gt_ids, _ = pre.batch_search(queries, filters, nq, qp10)
    gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
    dt, rtts = best_of_metered(
        lambda: pre.batch_search(queries, filters, nq, qp10), reps=3)
    log(f"10M prefilter (exact): qps={nq/dt:.0f}")
    out["prefilter"] = {
        "qps": round(nq / dt, 1), "recall": 1.0, "config": "exact,frac=2^-2",
        "device_qps_est": round(device_est(nq, dt, rtts), 1)}
    # the padded 10M store is 5.12 GB — never hold more than one 10M
    # index on the 16 GB chip (the 15:48 OOM cascade)
    del pre
    gc.collect()

    if glob.glob("bench_cache/deep10m_l2/vamana_100_48_*_10000000.npz"):
        idx = PostfilterVamanaIndex(
            points, labels,
            BuildParams(R=48, L=100, alpha=1.2,
                        cache_path="bench_cache/deep10m_l2/"),
            metric="l2", require_cache=True)
        best = {"qps": 0.0}
        for beam, fm in ((320, 2), (640, 2)):
            qp = build_query_params(k, beam, final_beam_multiply=fm)
            box = {}

            def run(qp=qp, box=box):
                box["ids"], _ = idx.batch_search(queries, filters, nq, qp)

            dt, rtts = best_of_metered(run, reps=2)
            rec = float(np.mean([
                len(gt_sets[i] & set(box["ids"][i].astype(np.int64).tolist()))
                / k for i in range(nq)]))
            log(f"10M postfilter beam={beam} fm={fm}: recall={rec:.4f} "
                f"qps={nq/dt:.0f}")
            if rec >= 0.9 and nq / dt > best["qps"]:
                best = {"qps": round(nq / dt, 1), "recall": round(rec, 4),
                        "config": f"R=48,L=100,beam={beam},fm={fm},frac=2^-2",
                        "device_qps_est": round(device_est(nq, dt, rtts), 1)}
        if best["qps"]:
            out["postfilter"] = best
        else:
            skip("10m_postfilter", "no config reached recall 0.9")
        del idx
        gc.collect()
    else:
        skip("10m_postfilter",
             "flat graph cache absent (bench_cache/deep10m_l2)")

    # 2-row B-WST (fenwick): at 10M the windowed fringe scan makes this
    # exact AND faster than the full prefilter scan — the first scale where
    # a tree family tops the chart (round-4 night runner: 1.0000 @ 8.9k QPS
    # at 2^-2 vs flat postfilter 0.904 @ 221).
    if glob.glob("bench_cache/deep10m_l2/wst_100_48_*_10000000_*row1.npz"):
        from rangefilteredann_tpu import RangeFilterTreeIndex

        try:
            tree = RangeFilterTreeIndex(
                points, labels, cutoff=5_000_000, split_factor=2,
                build_params=BuildParams(
                    R=48, L=100, alpha=1.2,
                    cache_path="bench_cache/deep10m_l2/"),
                metric="l2", device_rows_budget=4 << 30, require_cache=True)
            qp = build_query_params(k, 80, final_beam_multiply=2)
            box = {}

            def run_tree(box=box):
                box["ids"], _ = tree.batch_search(
                    queries, filters, nq, "fenwick", qp)

            dt, rtts = best_of_metered(run_tree, reps=2)
            rec = float(np.mean([
                len(gt_sets[i] & set(box["ids"][i].astype(np.int64).tolist()))
                / k for i in range(nq)]))
            log(f"10M fenwick beam=80: recall={rec:.4f} qps={nq/dt:.0f}")
            out["fenwick"] = {
                "qps": round(nq / dt, 1), "recall": round(rec, 4),
                "config": "R=48,L=100,cutoff=5M,beam=80,fm=2,frac=2^-2",
                "device_qps_est": round(device_est(nq, dt, rtts), 1)}
            del tree
            gc.collect()
        except Exception as e:  # noqa: BLE001 — keep the earlier families
            skip("10m_fenwick", f"{type(e).__name__}: {e}")
    else:
        skip("10m_fenwick", "tree row cache absent")
    return out


def bench_12m():
    """RedCaps-class 12M x 512 uint8 families (BASELINE config #4 shape:
    CLIP-like unit-sphere byte embeddings, L2 == angular rank order). Runs
    ONLY when both the /tmp dataset cache (tools/redcaps12m.py --gen-only,
    latent-16 generator, seed 41) and the flat graph cache exist — the cold
    build is ~3 h (ref: generate_datasets/generate_redcaps_data.py:15-16)."""
    import glob

    data_dir = "/tmp/redcaps12m_data"
    if not all(os.path.exists(f"{data_dir}/{n}.npy")
               for n in ("data", "labels", "queries")):
        skip("12m", "dataset cache absent (/tmp/redcaps12m_data)")
        return {}
    gc.collect()  # the padded uint8 store is 6.1 GB on-chip; never hold two
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    k = K
    points = np.load(f"{data_dir}/data.npy")
    labels = np.load(f"{data_dir}/labels.npy")
    queries = np.load(f"{data_dir}/queries.npy").astype(np.float32)
    nq = queries.shape[0]
    # REAL query workload: the reference ships its actual 800 CLIP text
    # queries (ref: artifacts/redcaps-512-angular_queries.npy, consumed by
    # experiments/run_our_method.py's redcaps config). When that artifact is
    # readable, tile it to the bench batch and map it through the synthetic
    # store's affine quantization (x -> 360x + 128, tools/redcaps12m.py
    # SCALE) so L2 against the uint8 store ranks as angular similarity —
    # the query GEOMETRY (norms, inter-query spread) is then real even
    # though the 12M store is a latent-16 stand-in (no egress for the real
    # image embeddings). GT is recomputed exactly below either way.
    # RFANN_12M_SYNTH_Q=1 keeps the old synthetic stream.
    real_q = "/root/reference/artifacts/redcaps-512-angular_queries.npy"
    q_kind = "synthetic"
    if (os.path.exists(real_q)
            and not int(os.environ.get("RFANN_12M_SYNTH_Q", "0"))):
        rq = np.load(real_q).astype(np.float32)  # [800, 512] unit-norm
        reps = -(-nq // rq.shape[0])
        queries = np.tile(rq * 360.0 + 128.0, (reps, 1))[:nq]
        q_kind = f"real-clip-{rq.shape[0]}"
    # fraction 2^-2 filter stream — EXACT replica of tools/redcaps12m.py's
    # frac_filters(2) so recalls line up with results/redcaps12m_r4.csv
    frng = np.random.default_rng(7002)
    lo = frng.uniform(0, 1 - 0.25, nq)
    filters = np.stack([lo, lo + 0.25], 1)

    out = {}
    pre = PrefilterIndex(points, labels, metric="l2")
    qp10 = build_query_params(k, k)
    gt_ids, _ = pre.batch_search(queries, filters, nq, qp10)
    gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
    dt, rtts = best_of_metered(
        lambda: pre.batch_search(queries, filters, nq, qp10), reps=3)
    log(f"12M uint8 prefilter (exact, {q_kind} queries): qps={nq/dt:.0f}")
    out["prefilter"] = {
        "qps": round(nq / dt, 1), "recall": 1.0,
        "config": f"exact,frac=2^-2,q={q_kind}",
        "device_qps_est": round(device_est(nq, dt, rtts), 1)}
    del pre
    gc.collect()

    if not glob.glob("bench_cache/redcaps12m/vamana_100_48_*_12000000.npz"):
        skip("12m_postfilter",
             "flat graph cache absent (bench_cache/redcaps12m)")
        return out
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=48, L=100, alpha=1.2,
                    cache_path="bench_cache/redcaps12m/"),
        metric="l2", require_cache=True)
    best = {"qps": 0.0}
    for beam, fm in ((320, 2), (640, 2), (640, 4)):
        qp = build_query_params(k, beam, final_beam_multiply=fm)
        box = {}

        def run(qp=qp, box=box):
            box["ids"], _ = idx.batch_search(queries, filters, nq, qp)

        dt, rtts = best_of_metered(run, reps=2)
        rec = float(np.mean([
            len(gt_sets[i] & set(box["ids"][i].astype(np.int64).tolist()))
            / k for i in range(nq)]))
        log(f"12M postfilter beam={beam} fm={fm}: recall={rec:.4f} "
            f"qps={nq/dt:.0f}")
        if rec >= 0.9 and nq / dt > best["qps"]:
            best = {"qps": round(nq / dt, 1), "recall": round(rec, 4),
                    "config": f"R=48,L=100,beam={beam},fm={fm},"
                              f"frac=2^-2,q={q_kind}",
                    "device_qps_est": round(device_est(nq, dt, rtts), 1)}
        if rec >= 0.99:
            break  # the ladder is ascending-cost; good enough
    if best["qps"]:
        out["postfilter"] = best
    else:
        skip("12m_postfilter", "no config reached recall 0.9")
    del idx
    gc.collect()
    return out


def bench_1m(recall_of_k=10):
    """SIFT-1M-scale families at the protocol batch size, using the cached
    R=64/L=500 protocol-class graph (BASELINE config #1's build params,
    ref: python_bindings.cpp:88, run_our_method.py:35). Returns {} when the
    graph cache is absent (cold driver runs stay bounded)."""
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    n, d, k = 1_000_000, 128, recall_of_k
    # EXACT replica of the tools/protocol_1m.make_data rng stream (also in
    # tools/r3_night.make_1m). If any copy drifts, the cache fingerprint
    # check fails and require_cache=True below raises instead of silently
    # cold-building for an hour inside the driver's bounded bench run.
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(1000, d)).astype(np.float32)
    points = (centers[rng.integers(0, 1000, n)]
              + 0.35 * rng.normal(size=(n, d))).astype(np.float32)
    labels = rng.uniform(size=n)
    lo_l, hi_l = float(labels.min()), float(labels.max())
    cache = os.path.join(
        "bench_cache", f"vamana_500_64_{1.2:.6f}_{lo_l:.6f}_{hi_l:.6f}_{n}.npz")
    # the exact prefilter needs no graph cache — measure it regardless, so a
    # machine reset can never blank the whole 1M family (round-4 weak #1)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + 0.35 * rng.normal(size=(NQ, d))).astype(np.float32)
    starts = rng.uniform(0, 1 - FRACTION, size=NQ)
    filters = np.stack([starts, starts + FRACTION], axis=1)

    out = {}
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    qp10 = build_query_params(k, k)
    gt_ids, _ = pre.batch_search(queries, filters, NQ, qp10)
    gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
    dt = best_of(lambda: pre.batch_search(queries, filters, NQ, qp10), reps=3)
    log(f"1M prefilter (exact): qps={NQ/dt:.0f}")
    out["prefilter"] = {"qps": round(NQ / dt, 1), "recall": 1.0,
                        "config": "exact"}

    # device-resident exact-scan rate at 1M (chip capability with transfers
    # amortized — same methodology as the 200k device_resident_qps field)
    try:
        import jax.numpy as jnp
        from rangefilteredann_tpu.ops.pallas_scan import (
            host_max_tiles, pallas_scan_bruteforce)
        from rangefilteredann_tpu.utils.data import (
            first_geq, pad_dim, pad_queries)

        ps = pre._ps
        ss = first_geq(pre._labels_sorted, filters[:, 0]).astype(np.int32)
        ee = first_geq(pre._labels_sorted, filters[:, 1]).astype(np.int32)
        o = np.argsort(ss + ee, kind="stable")
        w_d = pad_dim(ps.d)
        qs = pad_queries(queries, ps.d, ps.d_pad)[o, :w_d]
        mt = host_max_tiles(ss[o], ee[o], ps.n, w_d=w_d)
        q_dev = jnp.asarray(qs)
        s_dev, e_dev = jnp.asarray(ss[o]), jnp.asarray(ee[o])

        def scan_once():
            return pallas_scan_bruteforce(
                ps.data, ps.norms_sq, q_dev, s_dev, e_dev, k=k,
                metric=ps.metric, d_eff=w_d, max_tiles=mt)
        scan_once()[0].block_until_ready()
        best_dev = np.inf
        for _ in range(3):
            t0 = time.time()
            outs = [scan_once() for _ in range(4)]
            outs[-1][0].block_until_ready()
            best_dev = min(best_dev, (time.time() - t0) / 4)
        out["device_resident_qps"] = round(NQ / best_dev, 1)
        log(f"1M prefilter device-resident: qps={NQ/best_dev:.0f}")
        del ps, q_dev, s_dev, e_dev, outs
    except Exception as e:  # noqa: BLE001 — capability probe only
        log(f"1M device-resident probe failed: {type(e).__name__}: {e}")

    # own try block (round-3 advisor): a require_cache fingerprint drift
    # here must not discard the already-measured prefilter numbers above
    idx = None
    try:
        if not os.path.exists(cache):
            raise FileNotFoundError(f"graph cache absent ({cache})")
        idx = PostfilterVamanaIndex(
            points, labels,
            BuildParams(R=64, L=500, alpha=1.2, cache_path="bench_cache/"),
            require_cache=True)
        # pin the measurement config (round-3 verdict weak #3): the graph is
        # fingerprint-checked by require_cache; record the inline dtype so a
        # recall shift is attributable. NOTE the committed 0.9929-vs-0.9918
        # "drift" was two different query SAMPLES (NQ=2048 protocol run vs
        # NQ=10240 bench) on the same graph — sampling noise, not the index.
        inline = str(getattr(idx._graph, "inline_dtype", None))
        best = {"qps": 0.0}
        for beam, fm in ((80, 2), (160, 2)):
            qp = build_query_params(k, beam, final_beam_multiply=fm)
            box = {}

            def run(qp=qp, box=box):
                box["ids"], _ = idx.batch_search(queries, filters, NQ, qp)

            dt, rtts = best_of_metered(run, reps=2)
            rec = float(np.mean([
                len(gt_sets[i]
                    & set(box["ids"][i].astype(np.int64).tolist())) / k
                for i in range(NQ)]))
            log(f"1M postfilter beam={beam} fm={fm}: recall={rec:.4f} "
                f"qps={NQ/dt:.0f}")
            if rec >= 0.9 and NQ / dt > best["qps"]:
                best = {
                    "qps": round(NQ / dt, 1), "recall": round(rec, 4),
                    "config": (f"R=64,L=500,beam={beam},fm={fm},"
                               f"inline={inline},nq={NQ}"),
                    "device_qps_est": round(device_est(NQ, dt, rtts), 1),
                }
            if rec >= 0.99:
                break
        if best["qps"]:
            out["postfilter"] = best
    except Exception as e:  # noqa: BLE001 — keep the measured partial out
        skip("1m_postfilter", f"{type(e).__name__}: {e}")

    # 1M B-WST (fenwick) — only when the night runner's row caches exist
    # (probe row 1 AND the last row; a partial tree must not trigger an
    # unbounded cold build in the driver's bench run)
    from rangefilteredann_tpu import RangeFilterTreeIndex
    from rangefilteredann_tpu.models.range_filter_tree import (
        build_offset_rows, row_cache_filename)

    tree_bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    n_rows_1m = len(build_offset_rows(n, 1000, 2))
    if all(os.path.exists(row_cache_filename(
            "bench_cache/", tree_bp, lo_l, hi_l, n, 2, 1000, r))
           for r in (1, n_rows_1m - 1)):
        try:
            del idx
            gc.collect()
            tree = RangeFilterTreeIndex(points, labels, cutoff=1000,
                                        split_factor=2, build_params=tree_bp,
                                        require_cache=True)
            best_t = {"qps": 0.0}
            for beam in (40, 80):
                qp = build_query_params(k, beam, final_beam_multiply=2)
                box = {}

                def run(qp=qp, box=box):
                    box["ids"], _ = tree.batch_search(
                        queries, filters, NQ, "fenwick", qp)

                dt, rtts = best_of_metered(run, reps=2)
                rec = float(np.mean([
                    len(gt_sets[i]
                        & set(box["ids"][i].astype(np.int64).tolist())) / k
                    for i in range(NQ)]))
                log(f"1M fenwick beam={beam}: recall={rec:.4f} "
                    f"qps={NQ/dt:.0f}")
                if rec >= 0.9 and NQ / dt > best_t["qps"]:
                    best_t = {
                        "qps": round(NQ / dt, 1), "recall": round(rec, 4),
                        "config": f"R=48,L=100,beam={beam},fm=2",
                        "device_qps_est": round(device_est(NQ, dt, rtts), 1),
                    }
                if rec >= 0.99:
                    break
            if best_t["qps"]:
                out["fenwick"] = best_t
            # optimized_postfilter reuses the same rows and was the top
            # graph family at 200k (1.00 result-parts/query vs fenwick's
            # 8.00 — results/tree_plan_200k_r5.txt)
            best_o = {"qps": 0.0}
            for beam in (40, 80):
                qp = build_query_params(k, beam, final_beam_multiply=2)
                box = {}

                def run_o(qp=qp, box=box):
                    box["ids"], _ = tree.batch_search(
                        queries, filters, NQ, "optimized_postfilter", qp)

                dt, rtts = best_of_metered(run_o, reps=2)
                rec = float(np.mean([
                    len(gt_sets[i]
                        & set(box["ids"][i].astype(np.int64).tolist())) / k
                    for i in range(NQ)]))
                log(f"1M optimized_postfilter beam={beam}: recall={rec:.4f} "
                    f"qps={NQ/dt:.0f}")
                if rec >= 0.9 and NQ / dt > best_o["qps"]:
                    best_o = {
                        "qps": round(NQ / dt, 1), "recall": round(rec, 4),
                        "config": f"R=48,L=100,beam={beam},fm=2",
                        "device_qps_est": round(device_est(NQ, dt, rtts), 1),
                    }
                if rec >= 0.99:
                    break
            if best_o["qps"]:
                out["optimized_postfilter"] = best_o
        except Exception as e:  # noqa: BLE001 — keep the partial out
            skip("1m_fenwick", f"{type(e).__name__}: {e}")
    else:
        skip("1m_fenwick", "tree row caches absent")
    return out


if __name__ == "__main__":
    main()

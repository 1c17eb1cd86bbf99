"""RedCaps-scale 12M x 512 uint8 demo, rerunnable (the afternoon chain's
in-process variant stalled for hours in make_pointset's whole-array float64
norms transient — fixed to chunked in utils/data.py — plus a ~1h 6 GB store
upload). This version loads CPU-pregenerated arrays (run with
--gen-only under JAX_PLATFORMS=cpu first) so the TPU-holding process does
store upload + scans only.

Appends to results/scale_demos_r2.log.
Run:  nohup setsid python tools/night_12m.py > /tmp/night12m.log 2>&1 &
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = "results/scale_demos_r2.log"
CACHE_DIR = "/tmp/night12m_data"
N, D, NQ, K = 12_000_000, 512, 512, 10


def log(*a):
    line = f"[{time.strftime('%H:%M:%S')}] " + " ".join(str(x) for x in a)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def make_data(write_cache=False):
    """Replica of tools/final_batch.phase_12m_uint8's generator (seed 3)."""
    names = ("data", "labels", "queries")
    if not write_cache and all(
            os.path.exists(f"{CACHE_DIR}/{n}.npy") for n in names):
        return [np.load(f"{CACHE_DIR}/{n}.npy") for n in names]
    rng = np.random.default_rng(3)
    centers = rng.integers(30, 225, size=(1000, D)).astype(np.uint8)
    data = np.empty((N, D), dtype=np.uint8)
    # int16 noise draws + in-place ops: the default int64 stream allocated
    # ~12 GB of transients per 1M chunk and spent hours in page-zeroing on
    # this 1-core box; int16 in-place generates 12M x 512 in minutes
    for lo in range(0, N, 1_000_000):
        hi = lo + 1_000_000
        a = rng.integers(0, 1000, hi - lo)
        chunk = centers[a].astype(np.int16)
        chunk += rng.integers(-25, 26, size=(hi - lo, D), dtype=np.int16)
        np.clip(chunk, 0, 255, out=chunk)
        data[lo:hi] = chunk.astype(np.uint8)
    labels = rng.uniform(size=N)
    queries = np.clip(
        centers[rng.integers(0, 1000, NQ)].astype(np.int16)
        + rng.integers(-25, 26, size=(NQ, D), dtype=np.int16),
        0, 255).astype(np.uint8)
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
        print("cached", flush=True)
        return

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rangefilteredann_tpu import build_query_params
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    log("night12m: loading 12M x 512 uint8...")
    data, labels, queries = make_data()
    # labels and points are INDEPENDENT iid streams, so sorting the labels
    # alone preserves the joint distribution — and pre-sorted labels take
    # sort_by_labels' identity fast path (skips a 6 GB host permutation
    # gather that costs ~20 min of page-zeroing on this 1-core host)
    labels = np.sort(labels)
    rng = np.random.default_rng(99)

    t0 = time.time()
    idx = PrefilterIndex(data, labels, metric="Euclidian")
    log(f"night12m: 12M uint8 store resident in {time.time()-t0:.0f}s "
        f"(data {N*D/2**30:.1f} GiB as native bytes; an R=48 graph needs "
        f"{N*48*4/2**30:.1f} GiB more — fits 16 GB HBM with headroom)")
    for fexp in (2, 6):
        frac = 2.0 ** -fexp
        lo = rng.uniform(0, 1 - frac, NQ)
        filters = np.stack([lo, lo + frac], 1)
        idx.batch_search(queries.astype(np.float32), filters, NQ,
                         build_query_params(K, K))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            ids, d = idx.batch_search(queries.astype(np.float32), filters,
                                      NQ, build_query_params(K, K))
            best = min(best, time.perf_counter() - t0)
        log(f"night12m: 12M uint8 2^-{fexp} prefilter exact: {NQ/best:.0f} "
            f"qps (finite rows: "
            f"{np.isfinite(np.where(d < 3e38, d, np.inf)).all(1).mean():.2f})")
    log("night12m done")


if __name__ == "__main__":
    main()

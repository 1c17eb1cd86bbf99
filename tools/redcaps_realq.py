"""RedCaps 12M with the reference's REAL query embeddings (round-4 verdict
missing item 5: all committed numbers used synthetic queries; the one real
artifact available offline is the 800 x 512 CLIP text-query matrix at
/root/reference/artifacts/redcaps-512-angular_queries.npy,
ref: generate_datasets/generate_redcaps_queries.py:14-29).

The 12M base store stays the latent-16 synthetic stand-in (no egress to
fetch real RedCaps image embeddings), but the query workload becomes real:
unit-norm CLIP text vectors, quantized with the SAME uint8 transform as the
store (rint(x*SCALE + 128), matching the reference's Uint8 Euclidian
variant, ref: ParlayANN/.../euclidian_point.h:68-112). Measures exact
prefilter GT + QPS at the reference's redcaps fraction ladder
(ref: experiments/plot.py uses 2^-1 .. 2^-16 for redcaps-512-angular).

CPU pregen of the store first (shared cache with tools/redcaps12m.py):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      nice -n 19 python tools/redcaps12m.py --gen-only
TPU run (~10-15 min: 6 GB ingest + per-fraction scans):
  nohup setsid env RQ_DEADLINE=<epoch> python tools/redcaps_realq.py \
      > /tmp/redcaps_realq.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from redcaps12m import SCALE, make_data  # noqa: E402  (seed-41 store)

QUERIES_NPY = "/root/reference/artifacts/redcaps-512-angular_queries.npy"
OUT = "results/redcaps12m_realq_r5.csv"
FRACS = (1, 3, 5, 8, 13, 16)
K = 10
DEADLINE = float(os.environ.get("RQ_DEADLINE", time.time() + 40 * 60))
FMAX = np.float32(np.finfo(np.float32).max)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rangefilteredann_tpu import build_query_params
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    qreal = np.load(QUERIES_NPY)  # (800, 512) fp32 unit-norm CLIP text
    # Same quantization as the store so both live in one byte space.
    q = np.clip(np.rint(qreal * SCALE + 128.0), 0.0, 255.0)
    nq = q.shape[0]
    log(f"real queries: {qreal.shape} fp32 -> uint8-space fp32 matrix")

    log("loading 12M x 512 uint8 store (latent-16, seed 41)...")
    points, labels, _ = make_data()

    rows = ["filter_width,method,recall,average_time,qps,threads"]
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            old = [ln.rstrip("\n") for ln in f if ln.strip()]
        rows.extend(old[1:])
        done = {tuple(ln.split(",")[:2]) for ln in old[1:]}
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

    pre = PrefilterIndex(points, labels, metric="l2")
    qp10 = build_query_params(K, K)
    for fexp in FRACS:
        if left_min() < 3:
            log("deadline squeeze — stopping")
            break
        fw = f"2pow-{fexp}"
        if (fw, "prefiltering") in done:
            continue
        frac = 2.0 ** -fexp
        frng = np.random.default_rng(9000 + fexp)
        lo = frng.uniform(0, 1 - frac, nq)
        filters = np.stack([lo, lo + frac], 1)
        (ids, dists), dt = timed(
            lambda f=filters: pre.batch_search(q, f, nq, qp10))
        finite = float((dists[:, 0] < FMAX).mean())
        rows.append(f"{fw},prefiltering,1.0000,{dt/nq:.8f},{nq/dt:.1f},1")
        log(f"{fw}: qps={nq/dt:.0f} window-nonempty={finite:.3f}")
        flush()
    flush()
    log("redcaps_realq done ->", OUT)


if __name__ == "__main__":
    main()

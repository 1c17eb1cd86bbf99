"""A/B: fp32 inline blocks vs int8-quantized inline (+ exact rerank) on the
200k bench postfilter config. The beam kernel's per-step cost is dominated
by the inline block gather at ~490 GB/s (tools/exp_beam.py pieces) — int8
quarters the traffic; the quant path exact-reranks final candidates, so
public outputs stay exact. If QPS wins at equal recall, make int8 the
preferred inline dtype regardless of HBM headroom.

Run:  nohup setsid python tools/exp_int8inline.py > /tmp/exp_int8.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N, D, K, NQ = 200_000, 128, 10, 10240


def t_best(fn, reps=3):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models import base
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    q_assign = rng.integers(0, 1000, size=NQ)
    queries = (centers[q_assign] + 0.35 * rng.normal(size=(NQ, D))).astype(np.float32)
    starts = rng.uniform(0, 0.75, size=NQ)
    filters = np.stack([starts, starts + 0.25], axis=1)

    gt_idx = PrefilterIndex(points, labels, metric="Euclidian")
    gt_ids, _ = gt_idx.batch_search(queries, filters, NQ,
                                    build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
    del gt_idx
    import gc

    gc.collect()

    def recall(ids):
        return float(np.mean([
            len(gt_sets[i] & set(ids[i].astype(np.int64).tolist())) / K
            for i in range(NQ)]))

    bp = BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/")
    for label, budget in (("fp32", int(7e9)), ("int8", int(2e9))):
        base.INLINE_BUDGET = budget
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            idx = PostfilterVamanaIndex(points, labels, bp)
        print(f"[{label}] inline dtype: {idx._graph.inline_dtype}", flush=True)
        for beam, fm in ((40, 2), (80, 2), (160, 2)):
            qp = build_query_params(K, beam, final_beam_multiply=fm)
            box = {}

            def run(qp=qp, box=box):
                box["ids"], _ = idx.batch_search(queries, filters, NQ, qp)

            dt = t_best(run, reps=3)
            print(f"[{label}] beam={beam} fm={fm}: recall={recall(box['ids']):.4f} "
                  f"qps={NQ/dt:.0f}", flush=True)
        del idx
        gc.collect()
    print("done", flush=True)


if __name__ == "__main__":
    main()

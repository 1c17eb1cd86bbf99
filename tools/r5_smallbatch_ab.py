"""Small-batch (latency-bound) Pallas-vs-XLA beam A/B on the 200k graph.

The protocol-batch A/B (results/pallas_ab_r5.csv, 10240 queries) showed the
fused kernel at 0.40-0.91x of the XLA path — XLA amortizes its per-hop
gathers across a huge batch. This measures the OTHER regime the kernel was
kept for: small interactive batches, where the XLA path's multi-launch
doubling pays per-dispatch overhead that one fused kernel avoids.

Appends rows to results/pallas_ab_r5.csv with scale tags like "200k-nq256".
Requires the 200k bench caches; ~10 min warm. Run AFTER r5_night finishes
(one TPU process at a time):
    nohup setsid python tools/r5_smallbatch_ab.py > /tmp/r5_sb_ab.log 2>&1 &
"""

import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("RFANN_INLINE_BUDGET", "9.5e9")

import numpy as np  # noqa: E402

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from r5_night import K, _ab_rows, make_200k  # noqa: E402


def main():
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex

    points, labels, queries, filters = make_200k()
    idx = PostfilterVamanaIndex(
        points, labels,
        BuildParams(R=48, L=100, alpha=1.2, cache_path="bench_cache/"),
        require_cache=True)
    print("graph loaded; inline:", idx._graph.inline_dtype, flush=True)
    pre = PrefilterIndex(points, labels, metric="Euclidian")
    for nq in (256, 1024):
        q, f = queries[:nq], filters[:nq]
        gt_ids, _ = pre.batch_search(q, f, nq, build_query_params(K, K))
        gt_sets = [set(r.astype(np.int64).tolist()) for r in gt_ids]
        _ab_rows(idx, q, f, nq, gt_sets,
                 beams=(40, 80, 160), fms=(2,), scale_tag=f"200k-nq{nq}")
        gc.collect()
    print("small-batch A/B done", flush=True)


if __name__ == "__main__":
    main()

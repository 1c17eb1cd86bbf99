"""Post-change TPU ablations (run when the chip is free).

1. beam kernel time at beam 40/80 with the compare-masked merge
   (baselines with the two-sort merge: 148 / 217 ms per 2048 queries).
2. gather-share ablation: same search with degree_limit 48/24/12 — if time
   scales with R, expansion gathers dominate; if flat, merges/overhead do.
3. build-expand trial: fresh 200k Vamana build (no cache) with the default
   multi-expansion schedule vs expand=1, timing + recall of each graph.

Run: nohup setsid python tools/ablate_tpu.py > /tmp/ablate.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N, D, K, NQ, R = 200_000, 128, 10, 2048, 48


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def t_best(fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    points = (centers[rng.integers(0, 1000, N)]
              + .35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + .35 * rng.normal(size=(NQ, D))).astype(np.float32)

    from rangefilteredann_tpu.utils.data import (
        make_pointset, sort_by_labels, pad_queries)
    from rangefilteredann_tpu.ops.beam_search import batched_beam_search

    pts_s, ls, dec = sort_by_labels(points, labels)
    ps = make_pointset(pts_s, "l2")
    qpad = jnp.asarray(pad_queries(queries, ps.d, ps.d_pad))
    cache = "bench_cache/vamana_100_48_1.200000_0.000005_0.999999_200000.npz"
    with np.load(cache) as z:
        nbrs = jnp.asarray(z["nbrs"])
    s2g = jnp.arange(N, dtype=jnp.int32)
    st = jnp.zeros((NQ,), jnp.int32)

    def bs(beam, dl):
        def f():
            r = batched_beam_search(
                ps.data, ps.norms_sq, nbrs, s2g, qpad, st,
                beam=beam, k=0, cut=jnp.float32(1.35), limit=jnp.int32(N),
                metric="l2", expand=1, degree_limit=dl,
                norm_col=ps.norm_col, identity_map=True)
            jax.block_until_ready(r.frontier_ids)
        return f

    for beam in (40, 80):
        dt = t_best(bs(beam, 0))
        log(f"beam={beam} new-merge: {dt*1e3:.1f} ms ({NQ/dt:.0f} qps)")
    for dl in (24, 12):
        dt = t_best(bs(40, dl))
        log(f"beam=40 degree_limit={dl}: {dt*1e3:.1f} ms")

    # inline neighbor-vector blocks
    from rangefilteredann_tpu.models.vamana import SlabGraph
    g = SlabGraph(
        nbrs_dev=nbrs, slab_to_global_dev=s2g,
        nbrs_host=np.asarray(nbrs), degrees=None,
        bucket_slab_offsets=np.array([0, N]), identity_s2g=True)
    t0 = time.time()
    g.attach_inline(ps)
    jax.block_until_ready(g.nbr_vecs)
    log(f"attach_inline: {time.time()-t0:.1f}s "
        f"({g.inline_bytes(ps)/1e9:.1f} GB)")

    def bsi(beam):
        def f():
            r = batched_beam_search(
                ps.data, ps.norms_sq, nbrs, s2g, qpad, st,
                beam=beam, k=0, cut=jnp.float32(1.35), limit=jnp.int32(N),
                metric="l2", expand=1, norm_col=ps.norm_col,
                identity_map=True, nbr_vecs=g.nbr_vecs,
                nbr_norms=g.nbr_norms)
            jax.block_until_ready(r.frontier_ids)
        return f

    for beam in (40, 80):
        dt = t_best(bsi(beam))
        log(f"beam={beam} INLINE: {dt*1e3:.1f} ms ({NQ/dt:.0f} qps)")
    del g

    # build-expand trial (fresh small-ish builds, no cache)
    from rangefilteredann_tpu import BuildParams, build_query_params
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)
    import rangefilteredann_tpu.models.vamana as vam_mod

    frac = 2.0 ** -2
    lo = rng.uniform(0, 1 - frac, NQ)
    filters = np.stack([lo, lo + frac], 1)
    from rangefilteredann_tpu.models.prefilter import PrefilterIndex
    gt = PrefilterIndex(points, labels, metric="Euclidian")
    ids_gt, _ = gt.batch_search(queries, filters, NQ,
                                build_query_params(K, K))
    gt_sets = [set(r.astype(np.int64).tolist()) for r in ids_gt]

    orig = vam_mod.build_expand
    for name, fn in (("multi", orig), ("one", lambda L: 1)):
        vam_mod.build_expand = fn
        t0 = time.time()
        idx = PostfilterVamanaIndex(
            points, labels, BuildParams(R=48, L=100, alpha=1.2,
                                        cache_path=None))
        bt = time.time() - t0
        qp = build_query_params(K, 80, final_beam_multiply=2)
        ids, _ = idx.batch_search(queries, filters, NQ, qp)
        rec = np.mean([
            len(gt_sets[i] & set(ids[i].astype(np.int64).tolist())) / K
            for i in range(NQ)])
        log(f"build expand={name}: build {bt:.0f}s, recall@beam80 {rec:.4f}")
        del idx
    vam_mod.build_expand = orig
    log("done")


if __name__ == "__main__":
    main()

"""Beam-search per-step cost decomposition + merge-impl A/B (round 3).

The flat-postfilter e2e is kernel-bound (doubling driver already batches all
launches/fetches). This harness answers: where does a while_loop step's time
go at query shapes (Q=2048/10240, R=48, w=128, inline fp32 blocks), and does
the sort-free merge-path frontier merge beat the two-key lax.sort?

Phases:
  1. on-device piecewise step costs (fori_loop of N iterations, slope
     timing so dispatch floors cancel): inline block gather + distances,
     merge(sort), merge(path), window-filter sort.
  2. full-kernel A/B: batched_beam_search at beams 10..320, MERGE_IMPL
     sort vs path (cache-cleared retrace between impls).
  3. e2e A/B: doubling_postfilter at the bench config (beam 80 fm 2).

Run:  nohup setsid python tools/exp_beam.py > /tmp/exp_beam.log 2>&1 &
"""

import functools
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

N, D, K, R = 200_000, 128, 10, 48
NQ = 2048


def t_best(fn, reps=3):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def slope(fn_iters, lo=8, hi=72):
    """Per-iteration seconds with the dispatch floor cancelled."""
    t_lo = t_best(lambda: fn_iters(lo))
    t_hi = t_best(lambda: fn_iters(hi))
    return (t_hi - t_lo) / (hi - lo)


def make_bench_index():
    from rangefilteredann_tpu import BuildParams
    from rangefilteredann_tpu.models.postfilter_vamana import (
        PostfilterVamanaIndex)

    rng = np.random.default_rng(42)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, size=N)
    points = (centers[assign] + 0.35 * rng.normal(size=(N, D))).astype(np.float32)
    labels = rng.uniform(size=N)
    q_assign = rng.integers(0, 1000, size=10240)
    queries = (centers[q_assign] + 0.35 * rng.normal(size=(10240, D))).astype(np.float32)
    starts = rng.uniform(0, 0.75, size=10240)
    filters = np.stack([starts, starts + 0.25], axis=1)
    idx = PostfilterVamanaIndex(
        points, labels, BuildParams(R=48, L=100, alpha=1.2,
                                    cache_path="bench_cache/"))
    return idx, queries, filters


def phase_pieces(idx):
    from rangefilteredann_tpu.ops import beam_search as bs
    from rangefilteredann_tpu.ops.distances import gathered_distances
    from rangefilteredann_tpu.utils.data import pad_queries

    g = idx._graph
    ps = idx._ps
    assert g.nbr_vecs is not None, "inline blocks missing (need TPU budget)"
    w = g.nbr_vecs.shape[-1]
    rng = np.random.default_rng(0)
    qh = rng.normal(size=(NQ, D)).astype(np.float32)
    queries = jnp.asarray(pad_queries(qh, ps.d, ps.d_pad))[:, :w]
    base = jnp.asarray(rng.integers(0, N, size=NQ).astype(np.int32))

    # --- 1. inline block gather + distances ---
    # arrays are ARGUMENTS, not closure captures: jit closures over big
    # device arrays embed them as HLO constants (the remote-compile POST
    # then 413s — CLAUDE.md environment gotchas)
    @functools.partial(jax.jit, static_argnames=("iters",))
    def gd(nbr_vecs, nbr_norms, qs, base, iters):
        def body(i, acc):
            cur = (base + i * 9973) % N
            blk = nbr_vecs[cur][:, :R, :]          # [Q, R, w]
            nrm = nbr_norms[cur][:, :R]
            d = gathered_distances(qs, blk, nrm, "l2")
            return acc + d[:, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((NQ,), jnp.float32))

    dt = slope(lambda it: jax.block_until_ready(
        gd(g.nbr_vecs, g.nbr_norms, queries, base, iters=it)))
    print(f"inline gather+dists [Q={NQ},R={R},w={w}]: {dt*1e6:.0f} us/step "
          f"({NQ*R*w*4/dt/1e9:.0f} GB/s)", flush=True)

    # gather only (no matmul) to split DMA from MXU
    @functools.partial(jax.jit, static_argnames=("iters",))
    def go(nbr_vecs, base, iters):
        def body(i, acc):
            cur = (base + i * 9973) % N
            blk = nbr_vecs[cur][:, :R, :]
            return acc + blk[:, 0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((NQ,), jnp.float32))

    dt = slope(lambda it: jax.block_until_ready(go(g.nbr_vecs, base, iters=it)))
    print(f"inline gather only: {dt*1e6:.0f} us/step "
          f"({NQ*R*w*4/dt/1e9:.0f} GB/s)", flush=True)

    # --- 2. merge impls across beams ---
    # MEASURED (2026-08-17, v5e): merge[sort] 18-120 us/step at beams
    # 10-160 (681 at 640); merge[path] is 50-150x SLOWER at every beam
    # (take_along_axis/argmax row selection lowers far worse than the
    # native two-key sort). The merge-path variant is a dead end on TPU;
    # MERGE_IMPL stays "sort". Kernel step budget at Q=2048: inline gather
    # 103 us (489 GB/s, bandwidth-bound) + dists 37 us + merge ~40 us.
    for beam in (10, 20, 40, 80, 160, 320):
        f_d0 = np.sort(rng.normal(size=(NQ, beam)).astype(np.float32), axis=1)
        f_i0 = rng.integers(0, N, size=(NQ, beam)).astype(np.int32)
        f_e0 = rng.integers(0, 2, size=(NQ, beam)).astype(np.int32)
        c_i0 = rng.integers(0, N, size=(NQ, R)).astype(np.int32)
        c_d0 = rng.normal(size=(NQ, R)).astype(np.float32)
        args = tuple(jnp.asarray(x) for x in (f_i0, f_d0, f_e0, c_i0, c_d0))

        for name, fn in (("sort", bs._merge_frontier_cands),):
            @functools.partial(jax.jit, static_argnames=("iters",))
            def mg(f_i, f_d, f_e, c_i, c_d, iters, fn=fn):
                def body(i, st):
                    f_i, f_d, f_e = st
                    ci = (c_i + i) % N
                    cd = c_d + 1e-6 * i
                    return fn(f_i, f_d, f_e, ci, cd, beam)
                return jax.lax.fori_loop(0, iters, body, (f_i, f_d, f_e))

            dt = slope(lambda it: jax.block_until_ready(mg(*args, iters=it)))
            print(f"merge[{name}] beam={beam} C={R}: {dt*1e6:.0f} us/step",
                  flush=True)


def phase_kernel_ab(idx, queries):
    from rangefilteredann_tpu.ops import beam_search as bs
    from rangefilteredann_tpu.utils.data import pad_queries

    g, ps = idx._graph, idx._ps
    qpad = jnp.asarray(pad_queries(
        np.asarray(queries[:NQ], np.float32), ps.d, ps.d_pad))
    st = jnp.zeros((NQ,), jnp.int32)
    for impl in ("sort",):  # path measured 50-150x slower (see phase_pieces)
        bs.MERGE_IMPL = impl
        bs.batched_beam_search.clear_cache()
        for beam in (10, 20, 40, 80, 160, 320, 640, 1280, 2048):
            def run(beam=beam):
                r = bs.batched_beam_search(
                    ps.data, ps.norms_sq, g.nbrs_dev, g.slab_to_global_dev,
                    qpad, st, beam=beam, k=0, cut=jnp.float32(1.35),
                    limit=jnp.int32(N), metric="l2", expand=1,
                    norm_col=ps.norm_col, identity_map=True,
                    nbr_vecs=g.nbr_vecs, nbr_norms=g.nbr_norms,
                    nbr_scale=g.nbr_scale)
                jax.block_until_ready(r.frontier_ids)
            dt = t_best(run, reps=3)
            print(f"kernel[{impl}] beam={beam}: {dt*1e3:.1f} ms "
                  f"({NQ/dt:.0f} qps)", flush=True)


def phase_e2e(idx, queries, filters):
    from rangefilteredann_tpu import build_query_params
    from rangefilteredann_tpu.ops import beam_search as bs

    # narrow-fraction case: doubling cascade exercises spec-reuse + the
    # merge at large beams (2048 queries — 10240 would take minutes/run)
    rng = np.random.default_rng(5)
    lo6 = rng.uniform(0, 1 - 2.0**-6, size=2048)
    filters6 = np.stack([lo6, lo6 + 2.0**-6], axis=1)
    q6 = queries[:2048]

    for impl in ("sort",):  # path measured 50-150x slower (see phase_pieces)
        bs.MERGE_IMPL = impl
        bs.batched_beam_search.clear_cache()
        for beam, fm in ((40, 2), (80, 2)):
            qp = build_query_params(K, beam, final_beam_multiply=fm)
            dt = t_best(lambda: idx.batch_search(queries, filters, len(queries), qp),
                        reps=2)
            print(f"e2e[{impl}] beam={beam} fm={fm}: {dt*1e3:.0f} ms "
                  f"({len(queries)/dt:.0f} qps)", flush=True)
        qp = build_query_params(K, 40, final_beam_multiply=2)
        dt = t_best(lambda: idx.batch_search(q6, filters6, 2048, qp), reps=2)
        print(f"e2e[{impl}] frac=2^-6 beam=40 fm=2 (2048q): {dt*1e3:.0f} ms "
              f"({2048/dt:.0f} qps)", flush=True)


def main():
    idx, queries, filters = make_bench_index()
    print("=== pieces ===", flush=True)
    phase_pieces(idx)
    print("=== kernel A/B ===", flush=True)
    phase_kernel_ab(idx, queries)
    print("=== e2e A/B (10240 queries) ===", flush=True)
    phase_e2e(idx, queries, filters)
    print("done", flush=True)


if __name__ == "__main__":
    main()

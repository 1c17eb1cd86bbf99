"""Combined TPU validation: MIPS recall, adversarial dataset, beam cap smoke."""
import os, sys, time
os.chdir("/root/repo"); sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from rangefilteredann_tpu import (BuildParams, RangeFilterTreeIndex,
                                  build_query_params)
from rangefilteredann_tpu.models.postfilter_vamana import PostfilterVamanaIndex
from rangefilteredann_tpu.models.prefilter import PrefilterIndex

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

rng = np.random.default_rng(3)
n, d, nq, k = 50_000, 96, 1024, 10

# ---- MIPS (angular) recall: clustered normalized vectors (ann-benchmarks
# angular datasets are clustered; random isotropic directions are a
# pathological MIPS instance with no navigable structure) ----
cc = rng.normal(size=(200, d)).astype(np.float32)
a_p = rng.integers(0, 200, n)
pts = (cc[a_p] + 0.25 * rng.normal(size=(n, d))).astype(np.float32)
pts /= np.linalg.norm(pts, axis=1, keepdims=True)
labels = rng.uniform(size=n)
qs = (cc[rng.integers(0, 200, nq)] + 0.25 * rng.normal(size=(nq, d))
      ).astype(np.float32)
qs /= np.linalg.norm(qs, axis=1, keepdims=True)
frac = 2.0 ** -3
lo = rng.uniform(0, 1 - frac, nq)
filters = np.stack([lo, lo + frac], 1)
bp = BuildParams(R=32, L=64, alpha=1.2, cache_path=None)
pre = PrefilterIndex(pts, labels, metric="mips")
gt, _ = pre.batch_search(qs, filters, nq, build_query_params(k, k))
gt_sets = [set(r.astype(np.int64).tolist()) for r in gt]
# fp64 oracle audit of the mips scan itself (first 64 queries)
order = np.argsort(labels, kind="stable"); sl = labels[order]
p64 = pts[order].astype(np.float64)
bad = 0
for i in range(64):
    a = np.searchsorted(sl, filters[i, 0]); b = np.searchsorted(sl, filters[i, 1])
    ip = p64[a:b] @ qs[i].astype(np.float64)
    top = set(order[a:b][np.argsort(-ip, kind="stable")[:k]].tolist())
    bad += len(top - gt_sets[i])
log(f"mips scan vs fp64 oracle: {bad} mismatched ids / {64*k}")
assert bad <= 3, bad  # fp32-vs-fp64 boundary ties only
post = PostfilterVamanaIndex(pts, labels, bp, metric="mips")
recs = {}
for beam in (40, 80, 160):
    ids, _ = post.batch_search(qs, filters, nq,
                               build_query_params(k, beam, final_beam_multiply=2))
    recs[beam] = np.mean([
        len(gt_sets[i] & set(ids[i].astype(np.int64).tolist())) / k
        for i in range(nq)])
    log(f"MIPS postfilter recall beam={beam}: {recs[beam]:.4f}")
assert recs[160] >= 0.9, recs

# ---- adversarial (BASELINE config #5 shape): clustered vectors with
# cluster-correlated labels; queries target a DIFFERENT cluster's window ----
nc = 100
centers = rng.normal(size=(nc, d)).astype(np.float32)
assign = rng.integers(0, nc, n)
pts2 = (centers[assign] + 0.1 * rng.normal(size=(n, d))).astype(np.float32)
labels2 = (assign + rng.uniform(size=n)) / nc  # label ~ cluster id
q_cl = rng.integers(0, nc, nq)
qs2 = (centers[q_cl] + 0.1 * rng.normal(size=(nq, d))).astype(np.float32)
tgt = (q_cl + 37) % nc  # filter forces a different cluster's label window
filters2 = np.stack([tgt / nc, (tgt + 1) / nc], 1)
pre2 = PrefilterIndex(pts2, labels2, metric="Euclidian")
gt2, _ = pre2.batch_search(qs2, filters2, nq, build_query_params(k, k))
gt2_sets = [set(r.astype(np.int64).tolist()) for r in gt2]
tree = RangeFilterTreeIndex(pts2, labels2, cutoff=1000, split_factor=2,
                            build_params=bp)
def adv_run(m, qp):
    ids, _ = tree.batch_search(qs2, filters2, nq, m, qp)
    return np.mean([
        len(gt2_sets[i] & set(ids[i].astype(np.int64).tolist())) / k
        for i in range(nq)])

qp40 = build_query_params(k, 40, final_beam_multiply=2)
rec = adv_run("fenwick", qp40)
log(f"adversarial tree/fenwick recall: {rec:.4f}")
assert rec >= 0.99, rec
# optimized-postfiltering DEGRADES here by design (the adversarial set makes
# the filter window's cluster differ from the query's nearest cluster —
# the paper's motivation for the smart-combined ratio fallback)
rec_plain = adv_run("optimized_postfilter", qp40)
qp_sc = build_query_params(k, 40, final_beam_multiply=2,
                           min_query_to_bucket_ratio=2.0)
rec_sc = adv_run("optimized_postfilter", qp_sc)
log(f"adversarial opt-postfilter: plain={rec_plain:.4f} "
    f"smart-combined={rec_sc:.4f}")
assert rec_sc >= 0.99, rec_sc
assert rec_sc > rec_plain

# ---- beam cap smoke: MAX_SAFE_BEAM runs without crashing the worker ----
from rangefilteredann_tpu.models.postfilter_vamana import MAX_SAFE_BEAM
qp = build_query_params(k, MAX_SAFE_BEAM, final_beam_multiply=1)
ids, _ = post.batch_search(qs[:256], filters[:256], 256, qp)
log(f"beam={MAX_SAFE_BEAM} smoke OK")
log("ALL PASS")

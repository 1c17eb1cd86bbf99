"""Test config: force an 8-virtual-device CPU platform before any JAX use.

The environment's sitecustomize registers the `axon` TPU backend and pins
JAX_PLATFORMS=axon, so plain env vars are not enough — we must override via
jax.config. Multi-chip sharding tests run on this virtual CPU mesh; the real
TPU is only used by bench.py / manual verification.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache (keyed by platform, shared with bench/TPU runs):
# the box has ONE cpu core, so recompiling the beam/vamana kernels every
# suite run dominates wall time; warm runs skip straight to execution
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def brute_force_gt(points, labels, queries, filters, k, metric):
    """Exact ground truth matching the reference's range arithmetic:
    candidates are sorted positions in [first_geq(lo), first_geq(hi))
    (ref: src/prefiltering.h:157-184). Returns original ids [nq, k] (padded -1)
    and true distances.
    """
    order = np.argsort(labels, kind="stable")
    ls = labels[order]
    ids_out = np.full((len(queries), k), -1, dtype=np.int64)
    d_out = np.full((len(queries), k), np.inf, dtype=np.float64)
    for qi, (q, (lo, hi)) in enumerate(zip(queries, filters)):
        s = np.searchsorted(ls, lo, side="left")
        e = np.searchsorted(ls, hi, side="left")
        cand = order[s:e]
        if len(cand) == 0:
            continue
        if metric in ("l2", "Euclidian", "euclidean"):
            d = np.sum((points[cand].astype(np.float64) - q.astype(np.float64)) ** 2, axis=1)
        else:
            d = -points[cand].astype(np.float64) @ q.astype(np.float64)
        sel = np.lexsort((cand, d))[:k]
        ids_out[qi, : len(sel)] = cand[sel]
        d_out[qi, : len(sel)] = d[sel]
    return ids_out, d_out


@pytest.fixture(scope="session")
def gt_fn():
    return brute_force_gt

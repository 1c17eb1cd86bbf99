"""Minimal repro / bisect for the beam >= ~2560 TPU worker fault
(round-2 verdict item 7; CLAUDE.md "Known TPU faults").

Strategy: run candidate ops at growing beam sizes, EACH IN ITS OWN CHILD
PROCESS (a faulting kernel kills the worker; the parent survives to record
which op/beam faulted). Candidates, in increasing specificity:

  sort    — lax.sort of the [Q, beam + R] (dist, key) merge operands
  merge   — _merge_frontier_cands (the per-step compare-mask + sort)
  search  — full batched_beam_search on a real-sized random graph

Each child prints OK; a crash/timeout is recorded as the faulting config.
After any fault the chip can need minutes to come back — the parent waits
and polls jax.devices() via a probe child before continuing.

Run LAST in a session: nohup python tools/repro_beam_fault.py > /tmp/beamfault.log 2>&1 &
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, os
sys.path.insert(0, {repo!r})
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

what, beam = sys.argv[1], int(sys.argv[2])
Q, R, N = 2048, 48, 200_000
rng = np.random.default_rng(0)

if what == "sort":
    d = jnp.asarray(rng.normal(size=(Q, beam + R)).astype(np.float32))
    k = jnp.asarray(rng.integers(0, 2**30, size=(Q, beam + R)).astype(np.int32))
    out = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))(d, k)
    jax.block_until_ready(out)
elif what == "merge":
    from rangefilteredann_tpu.ops.beam_search import _merge_frontier_cands
    f_ids = jnp.asarray(rng.integers(0, N, size=(Q, beam)).astype(np.int32))
    f_d = jnp.sort(jnp.asarray(rng.normal(size=(Q, beam)).astype(np.float32)), axis=1)
    f_e = jnp.zeros((Q, beam), jnp.int32)
    c_ids = jnp.asarray(rng.integers(0, N, size=(Q, R)).astype(np.int32))
    c_d = jnp.asarray(rng.normal(size=(Q, R)).astype(np.float32))
    out = jax.jit(lambda *a: _merge_frontier_cands(*a, beam))(f_ids, f_d, f_e, c_ids, c_d)
    jax.block_until_ready(out)
elif what == "search":
    from rangefilteredann_tpu.ops.beam_search import batched_beam_search
    from rangefilteredann_tpu.utils.data import make_pointset, pad_queries
    d_dim = 128
    pts = rng.normal(size=(N, d_dim)).astype(np.float32)
    ps = make_pointset(pts, "l2")
    nbrs = jnp.asarray(rng.integers(0, N, size=(N, R)).astype(np.int32))
    qs = jnp.asarray(pad_queries(rng.normal(size=(256, d_dim)).astype(np.float32), d_dim, ps.d_pad))
    res = batched_beam_search(
        ps.data, ps.norms_sq, nbrs, jnp.arange(N, dtype=jnp.int32), qs,
        jnp.zeros(256, jnp.int32), beam=beam, k=0, cut=jnp.float32(1.35),
        limit=jnp.int32(N), metric="l2", norm_col=ps.norm_col, identity_map=True)
    jax.block_until_ready(res.frontier_ids)
elif what == "probe":
    print(jax.devices())
print("OK", what, beam, flush=True)
"""


def run_child(what, beam, timeout=1500):
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO), what, str(beam)],
            capture_output=True, text=True, timeout=timeout)
        ok = f"OK {what} {beam}" in p.stdout
        print(f"[{time.strftime('%H:%M:%S')}] {what} beam={beam}: "
              f"{'OK' if ok else 'FAIL rc=' + str(p.returncode)} "
              f"({time.time()-t0:.0f}s)", flush=True)
        if not ok:
            tail = (p.stderr or "")[-2000:]
            print(tail, flush=True)
        return ok
    except subprocess.TimeoutExpired:
        print(f"[{time.strftime('%H:%M:%S')}] {what} beam={beam}: TIMEOUT",
              flush=True)
        return False


def wait_for_chip():
    for _ in range(40):
        if run_child("probe", 0, timeout=300):
            return
        time.sleep(30)


if __name__ == "__main__":
    for what in ("sort", "merge", "search"):
        for beam in (2048, 2560, 3072, 4096, 5120):
            ok = run_child(what, beam)
            if not ok:
                print(f"=== first fault: {what} @ beam {beam} ===", flush=True)
                wait_for_chip()
    print("bisect done", flush=True)

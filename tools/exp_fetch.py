"""Tunnel fetch-granularity probe: does jax.device_get of a LIST of arrays
pay one ~30 ms dispatch floor per element, or one total? Decides whether
batched_range_bruteforce should concatenate per-chunk packed outputs on
device before the single fetch.

Run:  nohup setsid python tools/exp_fetch.py > /tmp/exp_fetch.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def t_best(fn, reps=5):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    # the prefilter's packed output shape at the bench config: 2 chunks of
    # [5120, 2k] int32
    a = jax.block_until_ready(jnp.asarray(
        rng.integers(0, 2**30, size=(5120, 20)).astype(np.int32)))
    b = jax.block_until_ready(jnp.asarray(
        rng.integers(0, 2**30, size=(5120, 20)).astype(np.int32)))
    cat = jax.block_until_ready(jnp.concatenate([a, b], axis=0))

    # fresh device arrays per rep — jax caches the host copy of an array
    # after its first device_get, so re-getting the same array is free and
    # measures nothing
    inc = jax.jit(lambda x, i: x + i)
    catf = jax.jit(lambda x, y: jnp.concatenate([x, y], axis=0))
    ctr = [0]

    def fresh():
        ctr[0] += 1
        return inc(a, ctr[0]), inc(b, ctr[0])

    def t_fresh(get, reps=5):
        get(*fresh())
        best = np.inf
        for _ in range(reps):
            x, y = fresh()
            jax.block_until_ready((x, y))
            t0 = time.perf_counter()
            get(x, y)
            best = min(best, time.perf_counter() - t0)
        return best

    dt = t_fresh(lambda x, y: jax.device_get(x))
    print(f"get single fresh [5120,20]: {dt*1e3:.1f} ms", flush=True)
    dt = t_fresh(lambda x, y: jax.device_get([x, y]))
    print(f"get fresh list of 2: {dt*1e3:.1f} ms", flush=True)
    dt = t_fresh(lambda x, y: jax.device_get([x, y, inc(x, 1), inc(y, 1)]))
    print(f"get fresh list of 4: {dt*1e3:.1f} ms", flush=True)
    dt = t_fresh(lambda x, y: jax.device_get(catf(x, y)))
    print(f"concat-on-device + get: {dt*1e3:.1f} ms", flush=True)
    del cat
    print("done", flush=True)


if __name__ == "__main__":
    main()

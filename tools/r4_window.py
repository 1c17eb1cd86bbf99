"""Round-4 chip-window runner: every on-chip A/B in ONE TPU process
(each process pays a 5-20 min claim wait in this environment — batch).

  1. exp_pallas_beam.main_200k  — fused beam kernel vs XLA, flat 200k
  2. exp_tree_inline.main       — tree int8-inline x Pallas grid, 200k
  3. exp_pallas_beam.main_1m    — kernel A/B on the 1M int8-inline graph

Run: nohup setsid python tools/r4_window.py > /tmp/r4_window.log 2>&1 &
"""

import gc
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RFANN_INLINE_BUDGET", "9.5e9")

import jax

import exp_pallas_beam
import exp_tree_inline


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def scrub():
    from rangefilteredann_tpu.models import base as _b

    _b._QCACHE.clear()
    gc.collect()
    try:
        for a in jax.live_arrays():
            a.delete()
    except Exception:
        pass
    jax.clear_caches()
    gc.collect()


if __name__ == "__main__":
    only = set(sys.argv[1:])
    for name, fn in (("beam200k", exp_pallas_beam.main_200k),
                     ("tree200k", exp_tree_inline.main),
                     ("beam1m", exp_pallas_beam.main_1m)):
        if only and name not in only:
            continue
        log(f"=== {name} ===")
        t0 = time.time()
        try:
            fn()
            log(f"=== {name} done in {(time.time()-t0)/60:.1f} min ===")
        except Exception:
            log(f"=== {name} FAILED ===\n" + traceback.format_exc())
        scrub()
    log("r4_window done")

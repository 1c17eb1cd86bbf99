"""Round-5b runner: the machine reset AGAIN (~21:00) and wiped bench_cache/
plus /tmp, so this window must rebuild everything the driver bench needs and
land the still-missing VERDICT evidence (adversarial 1M, super 1M).

Phases (priority = bench-evidence per minute, each deadline-gated, all
caches resumable under bench_cache/):

  bench200k   flat graph + B-WST rows + super rows (r3_night.phase_bench200k)
  m1_protocol 1M R=64/L=500 flat graph + protocol CSV (rebuilds the 1M cache)
  adv1m       adversarial config #5 run -> results/adversarial_1m.csv
  super1m     super tree at 1M          -> results/super_1m_r5.csv
  m1_tree     1M B-WST rows             -> bench 1m fenwick family
  warm200k    bench.py query shapes     -> .jax_cache for the driver bench

Run: nohup setsid env R5N_DEADLINE=<epoch> python tools/r5b_night.py \
         > /tmp/r5b_night.log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("RFANN_INLINE_BUDGET", "9.5e9")

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

DEADLINE = float(os.environ.get("R5N_DEADLINE", time.time() + 7 * 3600))
os.environ.setdefault("R3_DEADLINE", str(DEADLINE))
os.environ.setdefault("S1M_DEADLINE", str(DEADLINE))

from r3_night import phase_bench200k, phase_m1_protocol, phase_m1_tree, \
    scrub_device  # noqa: E402
from r5_night import phase_warm200k  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}] [{left_min():+.0f}m]", *a,
          flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def phase_adv1m():
    import adversarial_1m

    adversarial_1m.main()


def phase_super1m():
    import super1m

    super1m.main()


PHASES = [
    ("bench200k", phase_bench200k, 45),
    ("m1_protocol", phase_m1_protocol, 55),
    ("adv1m", phase_adv1m, 115),
    ("super1m", phase_super1m, 95),
    ("m1_tree", phase_m1_tree, 90),
    ("warm200k", phase_warm200k, 25),
]

if __name__ == "__main__":
    only = set(sys.argv[1:])
    log(f"r5b_night start; deadline in {left_min():.0f} min; "
        f"devices={jax.devices()}")
    for name, fn, est in PHASES:
        if only and name not in only:
            continue
        gate = 5 if name == "warm200k" else est * 0.9
        if left_min() < gate:
            log(f"=== phase {name} SKIPPED ({left_min():.0f} min left < "
                f"{gate:.0f}) ===")
            continue
        for attempt in (1, 2):
            log(f"=== phase {name} (est {est} min, attempt {attempt}) ===")
            t0 = time.time()
            try:
                fn()
                log(f"=== phase {name} done in "
                    f"{(time.time()-t0)/60:.1f} min ===")
                break
            except Exception:
                tb = traceback.format_exc()
                log(f"=== phase {name} FAILED after "
                    f"{(time.time()-t0)/60:.1f} min ===\n{tb}")
                scrub_device()
                if "RESOURCE_EXHAUSTED" not in tb or attempt == 2:
                    break
        scrub_device()
    log("r5b_night done")

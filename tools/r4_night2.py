"""Round-4 second night runner (one TPU process), in priority order:

  m1_grid      r3_night's 1M grid pass 2 — tree methods on the protocol
               rows (the ~82 min 1M B-WST row cache build; VERDICT #2).
               Resumes results/run_1m_r3.csv.
  deep10m      multi-fraction DEEP-10M sweep (flat + 2-row tree) into
               results/deep10m_l2_r4.csv (VERDICT #1 'done' criterion).
  adv1m        adversarial 1M CSV (VERDICT #8; ~100 min cold builds).
  mips_full    MIPS 17-fraction sweep + medoid A/B (VERDICT #5).

Run: nohup setsid env R3_DEADLINE=<epoch> python tools/r4_night2.py \
        > /tmp/r4_night2.log 2>&1 &
R3_DEADLINE also gates the imported r3_night phases.
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

import r3_night  # noqa: E402  (sets jax config, defines phases + deadline)

DEADLINE = r3_night.DEADLINE


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def left_min():
    return (DEADLINE - time.time()) / 60.0


def run_deep10m_fracs():
    os.environ["DEEP_DEADLINE"] = str(DEADLINE)
    import deep10m_fracs

    deep10m_fracs.DEADLINE = DEADLINE
    deep10m_fracs.main()


def run_adv1m():
    import adversarial_1m

    adversarial_1m.main()


def run_mips_full():
    os.environ["MIPS_DEADLINE"] = str(DEADLINE)
    import mips1m_full

    mips1m_full.DEADLINE = DEADLINE
    mips1m_full.main()


def run_beam_ab():
    import exp_pallas_beam

    exp_pallas_beam.main_200k()


# Reordered for the late-round TPU window: the Pallas-beam A/B first (cheap,
# decides whether the kernel routing helps or hurts the driver bench), then
# the 10M fraction sweep while its dataset/graph/tree caches are warm from
# the deep10m_tree runner, then the expensive cold builds.
PHASES = [
    ("beam_ab", run_beam_ab, 20),
    ("deep10m", run_deep10m_fracs, 75),
    ("m1_grid", r3_night.phase_m1_grid, 130),
    ("mips_full", run_mips_full, 45),
    ("adv1m", run_adv1m, 110),
]

if __name__ == "__main__":
    only = set(sys.argv[1:])
    log(f"r4_night2 start; deadline in {left_min():.0f} min")
    for name, fn, est in PHASES:
        if only and name not in only:
            continue
        if left_min() < est * 0.8:
            log(f"=== phase {name} SKIPPED ({left_min():.0f} min left < "
                f"0.8x est {est}) ===")
            continue
        log(f"=== phase {name} (est {est} min, {left_min():.0f} left) ===")
        t0 = time.time()
        try:
            fn()
            log(f"=== phase {name} done in {(time.time()-t0)/60:.1f} min ===")
        except Exception:
            log(f"=== phase {name} FAILED after "
                f"{(time.time()-t0)/60:.1f} min ===\n"
                + traceback.format_exc())
        r3_night.scrub_device()
        gc.collect()
    log("r4_night2 done")

"""End-of-round chain: fixed 10M demo -> split experiment -> 1M R64+inline
-> 12M uint8 smoke -> bench. One process (claim wedges are minutes each).

Run: nohup setsid python tools/endgame.py > /tmp/endgame.log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


if __name__ == "__main__":
    import demo_10m
    import final_batch

    for name, fn in (("10M", demo_10m.main),
                     ("split", final_batch.phase_split),
                     ("1m-r64-inline", final_batch.phase_1m_r64_inline),
                     ("12m-uint8", final_batch.phase_12m_uint8),
                     ("bench", final_batch.phase_bench)):
        try:
            log(f"=== {name} ===")
            fn()
        except Exception:
            log(f"{name} FAILED\n{traceback.format_exc()}")
    log("endgame done")

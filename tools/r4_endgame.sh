#!/bin/bash
# Round-4 endgame: waits for the night chain (PID $1), then runs the
# remaining TPU work back-to-back in priority order — each stage is its own
# process (HBM isolation; the 15:48 OOM-cascade lesson) and the claim
# handoff between processes is absorbed here instead of by me reacting:
#   1. tools/r4_verify_ab.py  — public-API verify on-chip + Pallas beam
#      layout A/B (45 min cap, dynamic deadline)
#   2. tools/redcaps12m.py    — 12M uint8 GT + R=48 graph build + sweep
#      (absolute deadline $2, keeps room for bench)
#   3. bench.py x3            — tunnel-drift best-of; last run sees the 12M
#      cache so families_12m lands in the JSON
# Launch: nohup setsid bash tools/r4_endgame.sh <chain_pid> <rc_deadline> \
#             > /tmp/r4_endgame.log 2>&1 &
set -u
PID=${1:?chain pid}
RC_DL=${2:?redcaps deadline epoch}
cd /root/repo
echo "[$(date +%H:%M:%S)] waiting for chain pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done

echo "[$(date +%H:%M:%S)] chain done; stage 1: verify + pallas A/B"
env VAB_DEADLINE=$(( $(date +%s) + 45 * 60 )) \
    python tools/r4_verify_ab.py > /tmp/r4_verify_ab.log 2>&1
echo "[$(date +%H:%M:%S)] verify_ab exit=$? (log /tmp/r4_verify_ab.log)"

echo "[$(date +%H:%M:%S)] stage 2: redcaps 12M (deadline $RC_DL)"
env RC_DEADLINE="$RC_DL" python tools/redcaps12m.py \
    > /tmp/redcaps12m.log 2>&1
echo "[$(date +%H:%M:%S)] redcaps exit=$? (log /tmp/redcaps12m.log)"

echo "[$(date +%H:%M:%S)] stage 3: bench x3"
for i in 1 2 3; do
    python bench.py > /tmp/bench_r4_"$i".json 2> /tmp/bench_r4_"$i".log
    echo "[$(date +%H:%M:%S)] bench $i exit=$?:"
    tail -c 600 /tmp/bench_r4_"$i".json
    echo
done
echo "[$(date +%H:%M:%S)] endgame done"

#!/bin/bash
# Round-4 tail watcher: waits for the mips retry watcher (PID $1 —
# tools/r4_mips_retry.sh, which itself runs verify_ab2 -> adv1m ->
# mips_full), then uses whatever chip window is left for:
#   1. tools/r4_packed_smoke.py under timeout 600 — bounded on-chip test of
#      the packed one-DMA Pallas variant (hang containment; a timeout-kill
#      wedges the chip for minutes, which super1m's claim-wait absorbs)
#   2. tools/super1m.py — the 1M super-tree build + sweep (verdict
#      weakness #6), deadline $2
# Launch: nohup setsid bash tools/r4_tail.sh <retry_pid> <deadline> \
#             > /tmp/r4_tail.log 2>&1 &
set -u
PID=${1:?retry watcher pid}
DL=${2:?super1m deadline epoch}
cd /root/repo
echo "[$(date +%H:%M:%S)] waiting for mips retry pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
NOW=$(date +%s)
if [ "$NOW" -gt $(( DL - 1200 )) ]; then
    echo "[$(date +%H:%M:%S)] < 20 min to deadline — skipping tail work"
    exit 0
fi
echo "[$(date +%H:%M:%S)] retry chain done; packed smoke (timeout 600)"
timeout 600 python tools/r4_packed_smoke.py > /tmp/packed_smoke.log 2>&1
echo "[$(date +%H:%M:%S)] packed smoke exit=$? (log /tmp/packed_smoke.log)"
echo "[$(date +%H:%M:%S)] super1m (deadline $DL)"
env S1M_DEADLINE="$DL" python tools/super1m.py > /tmp/super1m.log 2>&1
echo "[$(date +%H:%M:%S)] super1m exit=$?"

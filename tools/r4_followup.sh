#!/bin/bash
# Round-4 follow-up: wait for the r4_night2 runner (PID $1) to exit, then
# A/B the FIXED Pallas beam kernel on the freed chip (tools/exp_pallas_beam
# toggles bs.PALLAS_BEAM itself, so the conservative env default is fine).
# Launch: nohup setsid bash tools/r4_followup.sh <night2_pid> \
#             > /tmp/r4_followup.log 2>&1 &
set -u
PID=${1:?night2 pid}
echo "[$(date +%H:%M:%S)] waiting for night2 pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] night2 exited; starting fixed-kernel beam A/B"
cd /root/repo
timeout 2400 python tools/r4_window.py beam200k
echo "[$(date +%H:%M:%S)] r4_followup done"

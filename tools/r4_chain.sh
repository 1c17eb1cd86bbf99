#!/bin/bash
# Round-4 recovery chain after the 15:48 OOM cascade killed four phases.
# Waits for the beam-A/B follow-up (PID $1), then runs:
#   1. deep10m_fracs (sectioned — GT/flat/tree fit HBM one at a time)
#   2. r4_night2 phases m1_grid, mips_full, adv1m (1M scale; separate
#      process so a 10M OOM cannot poison them again)
# Launch: nohup setsid bash tools/r4_chain.sh <followup_pid> <deadline_epoch> \
#             > /tmp/r4_chain.log 2>&1 &
set -u
PID=${1:?followup pid}
DL=${2:?deadline epoch}
cd /root/repo
echo "[$(date +%H:%M:%S)] waiting for follow-up pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] chip free; stage 1: deep10m_fracs (sectioned)"
env DEEP_DEADLINE="$DL" python tools/deep10m_fracs.py
echo "[$(date +%H:%M:%S)] stage 2: m1_grid + mips_full + adv1m"
env R3_DEADLINE="$DL" python tools/r4_night2.py m1_grid mips_full adv1m
echo "[$(date +%H:%M:%S)] r4_chain done"

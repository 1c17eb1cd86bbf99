#!/bin/bash
# Re-run the mips_full phase (OOM'd 20:10, fixed by the shallow-copy medoid
# patch) after the endgame runner (PID $1) finishes its verify/redcaps/bench
# stages. Deadline $2 bounds the sweep (resumes landscape_1m_mips.csv).
# Launch: nohup setsid bash tools/r4_mips_retry.sh <endgame_pid> <deadline> \
#             > /tmp/r4_mips_retry.log 2>&1 &
set -u
PID=${1:?endgame pid}
DL=${2:?deadline epoch}
cd /root/repo
echo "[$(date +%H:%M:%S)] waiting for endgame pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
NOW=$(date +%s)
if [ "$NOW" -gt $(( DL - 900 )) ]; then
    echo "[$(date +%H:%M:%S)] < 15 min to deadline — skipping mips retry"
    exit 0
fi
echo "[$(date +%H:%M:%S)] endgame done; verify_ab rerun, adv1m, mips_full"
# separate processes: an OOM in one cannot poison the other (tonight's
# 20:10 cascade took out both phases from one wedged allocator)
env VAB_DEADLINE=$(( $(date +%s) + 40 * 60 )) \
    timeout 3000 python tools/r4_verify_ab.py \
    > /tmp/r4_verify_ab2.log 2>&1
echo "[$(date +%H:%M:%S)] verify_ab rerun exit=$?"
env R3_DEADLINE="$DL" python tools/r4_night2.py adv1m \
    > /tmp/r4_adv1m_retry_py.log 2>&1
echo "[$(date +%H:%M:%S)] adv1m retry exit=$?"
env R3_DEADLINE="$DL" python tools/r4_night2.py mips_full \
    > /tmp/r4_mips_retry_py.log 2>&1
echo "[$(date +%H:%M:%S)] mips_full retry exit=$?"

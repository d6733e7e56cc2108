#!/bin/bash
# Phase-2 chip-reclaim watchdog (see tools/r5e_watchdog.sh for rationale).
# At T_STOP touch STOP into every workdir/quality_r5_* run dir (graceful
# checkpoint + exit 0); at T_REAP SIGTERM the phase-2 process group.
# Usage: tools/r5f_watchdog.sh T_STOP_EPOCH T_REAP_EPOCH
set -u
T_STOP=$1
T_REAP=$2
cd /root/repo

while [ "$(date +%s)" -lt "$T_STOP" ]; do sleep 30; done
echo "[watchdog] T_STOP $(date -u): touching STOP sentinels" >&2
for d in workdir/quality_r5_*; do
    [ -d "$d" ] && touch "$d/STOP"
done

while [ "$(date +%s)" -lt "$T_REAP" ]; do
    sleep 30
    if [ -f /tmp/r5f_phase2.pid ] && ! kill -0 "$(cat /tmp/r5f_phase2.pid)" 2>/dev/null; then
        echo "[watchdog] phase2 already done $(date -u)" >&2
        exit 0
    fi
done

if [ -f /tmp/r5f_phase2.pid ]; then
    PID=$(cat /tmp/r5f_phase2.pid)
    if kill -0 "$PID" 2>/dev/null; then
        echo "[watchdog] T_REAP $(date -u): TERM phase2 pgid $PID" >&2
        kill -TERM -- "-$PID" 2>/dev/null || kill -TERM "$PID" 2>/dev/null
    fi
fi

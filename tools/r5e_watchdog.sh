#!/bin/bash
# Round-5 (wm4) chip-reclaim watchdog. The driver bench needs the real chip
# at round end and CANNOT evict a training client (two clients deadlock the
# axon tunnel), so:
#   - at T_STOP:  touch STOP into every workdir/quality_r5_* run dir —
#     train.py (runtime/preempt.py) checkpoints and exits 0; the pipeline
#     then proceeds straight to sampling/eval of the stopped checkpoint.
#   - at T_REAP:  SIGTERM the whole pipeline process group (pid file) —
#     last resort if sampling/analysis is still holding the chip.
# Usage: tools/r5e_watchdog.sh T_STOP_EPOCH T_REAP_EPOCH
set -u
T_STOP=$1
T_REAP=$2
cd /root/repo

while [ "$(date +%s)" -lt "$T_STOP" ]; do
    sleep 30
    # pipeline already finished? then nothing to guard
    if [ -f /tmp/r5e_pipeline.pid ] && ! kill -0 "$(cat /tmp/r5e_pipeline.pid)" 2>/dev/null; then
        echo "[watchdog] pipeline exited before T_STOP; idle-waiting for reap window" >&2
    fi
done

echo "[watchdog] T_STOP reached $(date -u): touching STOP sentinels" >&2
for d in workdir/quality_r5_*; do
    [ -d "$d" ] && touch "$d/STOP"
done

while [ "$(date +%s)" -lt "$T_REAP" ]; do
    sleep 30
done

if [ -f /tmp/r5e_pipeline.pid ]; then
    PID=$(cat /tmp/r5e_pipeline.pid)
    if kill -0 "$PID" 2>/dev/null; then
        echo "[watchdog] T_REAP reached $(date -u): TERM pipeline pgid $PID" >&2
        kill -TERM -- "-$PID" 2>/dev/null || kill -TERM "$PID" 2>/dev/null
    fi
fi
echo "[watchdog] done $(date -u)" >&2

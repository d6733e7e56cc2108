#!/bin/bash
# Round-5 final-hour relaunch (4th attempt) of the 2.3M/8k upsampling
# re-baseline on the SAME data + committed summarize_upsampling definition
# as results/r5_upsampling (34M, 0.0085 mean live acf err). Lost three
# times to sandbox reboots (r5e slot 3, r5f, r5g slot C).
#
# Self-contained: regenerates the seed-0 rotamer dataset (deterministic),
# trains 2.3M (defaults: 3x128) with EMA to match the 34M protocol, stops
# gracefully at T_STOP via the STOP sentinel (train exits 0, quality_run
# proceeds to inference from the newest checkpoint), and a T_REAP pgid
# TERM backstop frees the chip for the driver bench.
# Usage: tools/r5h_ups_rebaseline.sh T_STOP_EPOCH T_REAP_EPOCH
set -u
cd /root/repo
LOG=/tmp/r5h
mkdir -p "$LOG"

if [ "${1:-}" = "--run-pipeline" ]; then
    python scripts/quality_run.py --task upsampling \
        --run_name quality_r5_ups2p3m \
        --out /tmp/q_r5_ups2 --epochs 8000 --train_extra=--ema \
        >"$LOG/ups2.log" 2>&1
    python scripts/summarize_upsampling.py \
        --pkl /tmp/q_r5_ups2/samples/upsampling_out.pkl \
        > /tmp/q_r5_ups2/samples/acf_summary.json 2>>"$LOG/ups2.log"
    python scripts/persist_results.py --round 5 --task upsampling_2p3m \
        --src /tmp/q_r5_ups2/samples \
        --cmd "scripts/quality_run.py --task upsampling --run_name quality_r5_ups2p3m --epochs 8000 --train_extra=--ema + scripts/summarize_upsampling.py" \
        --note "2.3M/<=8k (STOP-capped) upsampling re-baseline, SAME data/definition as results/r5_upsampling (34M 0.0085)" \
        >>"$LOG/ups2.log" 2>&1
    echo "[r5h] pipeline done $(date -u)" >>"$LOG/ups2.log"
    exit 0
fi

T_STOP=$1
T_REAP=$2

# setsid: the pipeline gets its own process group so the T_REAP backstop
# can TERM the whole tree (train/inference children) without touching
# this watchdog.
setsid bash "$0" --run-pipeline &
PIPE_PID=$!
echo "$PIPE_PID" > /tmp/r5h_pipeline.pid

while :; do
    now=$(date +%s)
    if [ "$now" -ge "$T_STOP" ] && [ ! -f workdir/quality_r5_ups2p3m/STOP ]; then
        mkdir -p workdir/quality_r5_ups2p3m
        touch workdir/quality_r5_ups2p3m/STOP
        echo "[r5h] STOP sentinel dropped $(date -u)" >>"$LOG/watchdog.log"
    fi
    if ! kill -0 "$PIPE_PID" 2>/dev/null; then
        echo "[r5h] pipeline exited $(date -u)" >>"$LOG/watchdog.log"
        break
    fi
    if [ "$now" -ge "$T_REAP" ]; then
        echo "[r5h] T_REAP: TERM pipeline pgid $(date -u)" >>"$LOG/watchdog.log"
        kill -TERM -- -"$PIPE_PID" 2>/dev/null
        sleep 20
        kill -KILL -- -"$PIPE_PID" 2>/dev/null
        break
    fi
    sleep 15
done
echo "[r5h] watchdog done $(date -u)" >>"$LOG/watchdog.log"

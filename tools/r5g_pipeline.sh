#!/bin/bash
# Round-5 (wm4) chip-queue takeover — the r5f phase-2 orchestrator died with
# the previous session while its 72M train child survived. This script
# adopts the live train by PID, then finishes the queue:
#   B. 72M (6x512) eval: scripts/eval_protocol.py (prestage cached in
#      /tmp/eval_r5w) + persist as results/r5_wide
#   C. upsampling 2.3M/8k re-baseline under the committed
#      summarize_upsampling definition (r5e slot 3)
#   D. design 2.3M retrain, epochs time-budgeted against T_END, then the
#      inference-only dirichlet_flow_temp sweep on the fresh checkpoint
# Stages check the clock and skip when they cannot fit; the r5f watchdog
# (T_STOP sentinel + T_REAP pgid TERM) is the backstop so the driver bench
# always gets the chip.
# Usage: tools/r5g_pipeline.sh TRAIN_PID T_END_EPOCH
set -u
cd /root/repo
TRAIN_PID=$1
T_END=$2
LOG=/tmp/r5g
mkdir -p "$LOG"
echo $$ > /tmp/r5g_pipeline.pid

left() { echo $(( T_END - $(date +%s) )); }

# A. adopt the live 72M train
echo "[r5g] waiting on 72M train pid $TRAIN_PID $(date -u)"
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 30; done
echo "[r5g] 72M train exited $(date -u)"

# B. eval the wide probe (sampling on chip; floor + eval data prestaged)
python scripts/eval_protocol.py --ckpt workdir/quality_r5_wide \
    --train_data /tmp/q_r5_wide/data --out /tmp/eval_r5w \
    >"$LOG/wide_eval.log" 2>&1
python scripts/persist_results.py --round 5 --task wide \
    --src /tmp/eval_r5w/samples \
    --cmd "train.py (quality_run sim recipe, 6x512, chi_loss_weight 3, EMA, lr 2e-4, 15k steps) + scripts/eval_protocol.py" \
    --note "72M (6x512) wider-model capacity probe, same data/recipe as the 34M 5x384 sim runs; tight-protocol ratio-to-floor vs the 34M plateau 1.35/1.39/1.43x at 30/41/60k" \
    >>"$LOG/wide_eval.log" 2>&1
echo "[r5g] wide eval done $(date -u), $(left)s left"

# C. upsampling 2.3M/8k re-baseline (needs ~75 min; skip under 70)
if [ "$(left)" -gt 4200 ]; then
    echo "[r5g] slot C: upsampling 2.3M/8k re-baseline $(date -u)"
    mkdir -p /tmp/q_r5_ups2
    [ -d /tmp/q_r5_ups2/data ] || cp -r /tmp/q_r5_wide/data /tmp/q_r5_ups2/data
    python scripts/quality_run.py --task upsampling \
        --run_name quality_r5_ups2p3m \
        --out /tmp/q_r5_ups2 --epochs 8000 --skip_data \
        >"$LOG/ups2.log" 2>&1
    python scripts/summarize_upsampling.py \
        --pkl /tmp/q_r5_ups2/samples/upsampling_out.pkl \
        > /tmp/q_r5_ups2/samples/acf_summary.json 2>>"$LOG/ups2.log"
    python scripts/persist_results.py --round 5 --task upsampling_2p3m \
        --src /tmp/q_r5_ups2/samples \
        --cmd "scripts/quality_run.py --task upsampling --run_name quality_r5_ups2p3m --epochs 8000 + scripts/summarize_upsampling.py" \
        --note "2.3M/8k upsampling re-baseline on the SAME data/definition as results/r5_upsampling (34M 0.0085)" \
        >>"$LOG/ups2.log" 2>&1
    echo "[r5g] slot C done $(date -u)"
else
    echo "[r5g] slot C skipped: $(left)s left"
fi

# D. design 2.3M retrain + dirichlet_flow_temp sweep. Reserve ~30 min for
# the sweep and ~10 min for quality_run's own inference+analysis; budget
# train epochs at ~2.2 steps/s; need >=2000 steps to bother.
SWEEP_RESERVE=1800
BUDGET=$(( $(left) - SWEEP_RESERVE - 600 ))
EPOCHS=$(( BUDGET * 22 / 10 ))
[ "$EPOCHS" -gt 8000 ] && EPOCHS=8000
if [ "$EPOCHS" -ge 2000 ]; then
    echo "[r5g] slot D: design 2.3M retrain, $EPOCHS epochs $(date -u)"
    mkdir -p /tmp/q_r5_design
    [ -d /tmp/q_r5_design/data ] || cp -r /tmp/q_r5_wide/data /tmp/q_r5_design/data
    python scripts/quality_run.py --task design \
        --run_name quality_r5_design2p3m \
        --out /tmp/q_r5_design --epochs "$EPOCHS" --skip_data \
        --train_extra=--ema >"$LOG/design.log" 2>&1
    python scripts/persist_results.py --round 5 --task design_2p3m \
        --src /tmp/q_r5_design/samples \
        --cmd "scripts/quality_run.py --task design --run_name quality_r5_design2p3m --epochs $EPOCHS --train_extra=--ema" \
        --note "design 2.3M retrain (rotamer-diverse data) as the temp-sweep base; r4 34M/30k designed recovery was 0.1445" \
        >>"$LOG/design.log" 2>&1
    if [ "$(left)" -gt 900 ]; then
        python scripts/design_temp_sweep.py \
            --ckpt workdir/quality_r5_design2p3m \
            --out /tmp/q_r5_tempsweep --temps 0.2,0.5,1.0 \
            --data_dir /tmp/q_r5_design/data >"$LOG/sweep.log" 2>&1
        python scripts/persist_results.py --round 5 --task temp_sweep \
            --src /tmp/q_r5_tempsweep \
            --cmd "scripts/design_temp_sweep.py --temps 0.2,0.5,1.0 on workdir/quality_r5_design2p3m" \
            --note "inference-only dirichlet_flow_temp sweep: does sharpening the flow softmax recover the 0.70-hedging headroom found by design_ceiling_probe?" \
            >>"$LOG/sweep.log" 2>&1
    else
        echo "[r5g] sweep skipped: $(left)s left"
    fi
else
    echo "[r5g] slot D skipped: $(left)s left"
fi
echo "[r5g] done $(date -u)"

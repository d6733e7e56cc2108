#!/bin/bash
# Round-5 (wm4) chip queue — relaunch of the r5d queue lost to the sandbox
# reboot (workdir/ checkpoints + /tmp datasets wiped, pipeline killed).
# Committed under tools/ so the recipe itself survives the next wipe.
#
# Serialized: ONE TPU client at a time (two deadlock the axon tunnel,
# BENCH.md "Measurement hygiene"). Each stage is resumable:
#   - quality_run --resume restores the newest workdir checkpoint
#   - quality_run --skip_train/--skip_data score an already-trained ckpt
#   - eval_protocol --skip_sample reuses existing samples
#
# Slot 1: attention same-budget baseline for the Hyena row
#         (2.3M, 15k steps, chi_loss_weight 3, EMA — the exact Hyena recipe
#         minus --hyena; results/r5_hyena was 0.1754 mean torsion JSD).
# Slot 2: 72M (6x512) wider-model capacity probe, same recipe as the 34M
#         5x384 sim runs (chi=3, EMA, lr 2e-4, B=8), 15k steps, scored with
#         the tight eval protocol (ratio-to-floor comparable with the
#         34M 30k/41k/60k plateau points 1.35/1.39/1.43x).
# Slot 3 (if the clock allows): upsampling 2.3M/8k re-baseline under the
#         committed summarize_upsampling definition.
set -u
cd /root/repo
LOG=/tmp/r5e
mkdir -p "$LOG"
echo $$ > /tmp/r5e_pipeline.pid

echo "[pipeline] slot 1: attention 2.3M/15k same-budget baseline $(date -u)"
python scripts/quality_run.py --task sim --run_name quality_r5_attn \
    --out /tmp/q_r5_attn --epochs 15000 --chi_loss_weight 3 \
    --train_extra=--ema >"$LOG/attn.log" 2>&1
python scripts/persist_results.py --round 5 --task attn \
    --src /tmp/q_r5_attn/samples \
    --cmd "scripts/quality_run.py --task sim --run_name quality_r5_attn --epochs 15000 --chi_loss_weight 3 --train_extra=--ema" \
    --note "attention same-budget baseline for the Hyena row (2.3M, 15k steps, chi_loss_weight 3, EMA); compare results/r5_hyena 0.1754" \
    >>"$LOG/attn.log" 2>&1

echo "[pipeline] slot 2: 72M (6x512) wider-model capacity probe $(date -u)"
# same default dataset (seed 0, 8x5000 rotamer-diverse) — reuse slot 1's copy
mkdir -p /tmp/q_r5_wide
[ -d /tmp/q_r5_wide/data ] || cp -r /tmp/q_r5_attn/data /tmp/q_r5_wide/data
python scripts/quality_run.py --task sim --run_name quality_r5_wide \
    --out /tmp/q_r5_wide --epochs 15000 --skip_data \
    --num_layers 6 --embed_dim 512 --mha_heads 16 --ipa_heads 4 \
    --ipa_head_dim 32 --ipa_qk 8 --ipa_v 8 --lr 2e-4 --chi_loss_weight 3 \
    --train_extra=--ema >"$LOG/wide.log" 2>&1
python scripts/eval_protocol.py --ckpt workdir/quality_r5_wide \
    --train_data /tmp/q_r5_wide/data --out /tmp/eval_r5w \
    >"$LOG/wide_eval.log" 2>&1
python scripts/persist_results.py --round 5 --task wide \
    --src /tmp/eval_r5w/samples \
    --cmd "scripts/quality_run.py --task sim --run_name quality_r5_wide --epochs 15000 --num_layers 6 --embed_dim 512 --mha_heads 16 --ipa_heads 4 --ipa_head_dim 32 --ipa_qk 8 --ipa_v 8 --lr 2e-4 --chi_loss_weight 3 --train_extra=--ema + scripts/eval_protocol.py" \
    --note "72M (6x512) wider-model capacity probe, 15k steps (or graceful-stop step — see log), same recipe as the 34M 5x384 runs; tight eval protocol ratio-to-floor vs the 34M plateau 1.35/1.39/1.43x" \
    >>"$LOG/wide_eval.log" 2>&1

echo "[pipeline] slot 3: upsampling 2.3M/8k re-baseline $(date -u)"
mkdir -p /tmp/q_r5_ups2
[ -d /tmp/q_r5_ups2/data ] || cp -r /tmp/q_r5_attn/data /tmp/q_r5_ups2/data
python scripts/quality_run.py --task upsampling --run_name quality_r5_ups2p3m \
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

echo "[pipeline] done $(date -u)"

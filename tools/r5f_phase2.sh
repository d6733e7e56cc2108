#!/bin/bash
# Round-5 (wm4) chip queue, phase 2 — replaces r5e_pipeline.sh slots 2-3
# after timing analysis: the 72M probe's post-STOP critical path must be
# minimal so the chip is free well before the driver bench. Changes vs r5e:
#   - the wide run trains via train.py directly (the quality_run 6x512
#     recipe) and skips quality_run's redundant 10-rollout pass — the
#     deliverable is eval_protocol's ratio-to-floor, comparable with the
#     34M plateau points (1.35/1.39/1.43x at 30/41/60k).
#   - eval_protocol's 20k-frame eval dataset + single-path noise floor are
#     pre-staged on CPU WHILE the chip trains (eval_protocol skips both
#     when present), so after the graceful STOP only sampling (chip) and
#     JSD analysis (CPU) remain.
# Driven by tools/r5f_watchdog args: STOP sentinel ~01:40, reap 02:20.
set -u
cd /root/repo
LOG=/tmp/r5e
mkdir -p "$LOG"
echo $$ > /tmp/r5f_phase2.pid

# A. wait for the orphaned slot-1 quality_run (attention baseline) to finish
echo "[phase2] waiting for slot-1 attn quality_run $(date -u)"
while ! grep -q "QUALITY RUN OK" "$LOG/attn.log" 2>/dev/null; do
    if [ "$(date +%s)" -gt 1787187600 ]; then  # 00:40 UTC failsafe
        echo "[phase2] slot-1 wait timed out; continuing" >&2
        break
    fi
    sleep 20
done

# B. persist the attention baseline (metrics JSON line -> samples/, results/)
python - <<'EOF'
import re
try:
    txt = open('/tmp/r5e/attn.log').read()
    m = re.findall(r'^\{"per_peptide_mean_torsion_jsd".*\}$', txt, re.M)
    if m:
        open('/tmp/q_r5_attn/samples/analysis_metrics.json', 'w').write(m[-1])
        print('extracted attn metrics:', m[-1])
except FileNotFoundError:
    pass
EOF
python scripts/persist_results.py --round 5 --task attn \
    --src /tmp/q_r5_attn/samples \
    --cmd "scripts/quality_run.py --task sim --run_name quality_r5_attn --epochs 15000 --chi_loss_weight 3 --train_extra=--ema" \
    --note "attention same-budget baseline for the Hyena row (2.3M, 15k steps, chi_loss_weight 3, EMA); compare results/r5_hyena 0.1754" \
    >>"$LOG/attn.log" 2>&1

# C. 72M (6x512) wider-model capacity probe — train in the background
echo "[phase2] launching 72M train $(date -u)"
mkdir -p /tmp/q_r5_wide
[ -d /tmp/q_r5_wide/data ] || cp -r /tmp/q_r5_attn/data /tmp/q_r5_wide/data
D=/tmp/q_r5_wide/data
python train.py --sim_condition --prepend_ipa --abs_pos_emb --abs_time_emb \
    --crop 4 --num_frames 100 --num_layers 6 --embed_dim 512 \
    --mha_heads 16 --ipa_heads 4 --ipa_head_dim 32 --ipa_qk 8 --ipa_v 8 \
    --batch_size 8 --lr 2e-4 --chi_loss_weight 3.0 --epochs 15000 \
    --data_dir "$D" --train_split "$D/split.csv" --val_split "$D/split.csv" \
    --val_epoch_freq 500 --val_batches 1 --ckpt_freq 1000 --print_freq 200 \
    --run_name quality_r5_wide --ema >"$LOG/wide.log" 2>&1 &
TRAIN_PID=$!

# D. pre-stage the eval dataset + matched noise floor on CPU meanwhile
JAX_PLATFORMS=cpu python - <<'EOF' >>"$LOG/wide_eval.log" 2>&1
import os, sys
sys.path.insert(0, '/root/repo')
from mdgen_tpu.data import write_synthetic_dataset
PEPTIDES = ["ACDE", "WYNK", "GSVL", "FHMT", "RQIP", "DKYA", "NEWS", "LCTV"]
d = '/tmp/eval_r5w/data'
if not os.path.exists(os.path.join(d, 'split.csv')):
    write_synthetic_dataset(d, [(s, s) for s in PEPTIDES], num_frames=20000,
                            seed=0, rotamers=True, path_seed=500,
                            replay_frames=5000)
print('eval data staged', flush=True)
EOF
if [ ! -f /tmp/eval_r5w/floor/samples/floor.pkl ]; then
    JAX_PLATFORMS=cpu python scripts/noise_floor.py \
        --mddir /tmp/eval_r5w/data --out /tmp/eval_r5w/floor \
        --n_gen 5000 --n_paths 1 --replay_frames 5000 --seed 0 \
        >>"$LOG/wide_eval.log" 2>&1
fi
echo "[phase2] eval prestage done $(date -u)"

wait "$TRAIN_PID"
echo "[phase2] 72M train exited $(date -u)"

# E. eval_protocol goes straight to sampling + analysis (prestage cached)
python scripts/eval_protocol.py --ckpt workdir/quality_r5_wide \
    --train_data /tmp/q_r5_wide/data --out /tmp/eval_r5w \
    >>"$LOG/wide_eval.log" 2>&1
python scripts/persist_results.py --round 5 --task wide \
    --src /tmp/eval_r5w/samples \
    --cmd "train.py (quality_run sim recipe, 6x512, chi_loss_weight 3, EMA, lr 2e-4, epochs 15000 or graceful STOP) + scripts/eval_protocol.py" \
    --note "72M (6x512) wider-model capacity probe on the same data/recipe as the 34M 5x384 sim runs; tight-protocol ratio-to-floor vs the 34M plateau 1.35/1.39/1.43x at 30/41/60k" \
    >>"$LOG/wide_eval.log" 2>&1
echo "[phase2] done $(date -u)"

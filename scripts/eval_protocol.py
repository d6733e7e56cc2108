"""Tight sim-quality evaluation protocol (round 3) — reproducible driver.

Chains, through the real CLI surface (like scripts/quality_run.py):
  1. an independent 20k-frame eval trajectory per peptide, resampled from
     the SAME physical systems a default-mode training set was drawn from
     (``path_seed`` + ``replay_frames`` — see data/synthetic.py),
  2. 50 chained rollouts (5000 frames) per peptide from a trained
     checkpoint via ``sim_inference.py`` (needs the TPU),
  3. ``scripts/analyze_peptide_sim.py`` JSDs of those samples vs the eval
     trajectory,
  4. the matched single-continuous-path noise floor
     (``scripts/noise_floor.py``),
and prints a model-vs-floor table per torsion type. This is the protocol
behind BENCH.md "Round 3" — the default quality-loop protocol saturates
(floor ~0.24 at 10x100 frames vs 5k).

    python scripts/eval_protocol.py --ckpt workdir/quality_r3_sim \
        --train_data /tmp/quality_r3_sim/data --out /tmp/eval_r3
"""
import argparse
import json
import os
import pickle
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_ENV = dict(os.environ)
os.environ["JAX_PLATFORMS"] = "cpu"

PEPTIDES = ["ACDE", "WYNK", "GSVL", "FHMT", "RQIP", "DKYA", "NEWS", "LCTV"]


def run(cmd, env=None):
    print("+", " ".join(cmd), flush=True)
    e = dict(BASE_ENV)
    if env:
        e.update(env)
    subprocess.run(cmd, check=True, env=e, cwd=REPO)


def summarize(pkl_path):
    with open(pkl_path, "rb") as fh:
        out = pickle.load(fh)
    per_type, tors = {}, []
    for d in out.values():
        for k, v in d["JSD"].items():
            typ = k.split()[0] if "|" not in k else "RAMA"
            per_type.setdefault(typ, []).append(v)
            if "|" not in k and not k.startswith("TICA"):
                tors.append(v)
    return (
        {t: float(np.mean(v)) for t, v in per_type.items()},
        float(np.mean(tors)),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--train_data", type=str, required=True,
                   help="the default-mode dataset dir the model trained on")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--train_frames", type=int, default=5000,
                   help="num_frames of the training dataset (replay key)")
    p.add_argument("--eval_frames", type=int, default=20000)
    p.add_argument("--num_rollouts", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_sample", action="store_true",
                   help="reuse existing samples in {out}/samples")
    args = p.parse_args()

    from mdgen_tpu.data import write_synthetic_dataset

    data_dir = os.path.join(args.out, "data")
    samp_dir = os.path.join(args.out, "samples")
    if not os.path.exists(os.path.join(data_dir, "split.csv")):
        write_synthetic_dataset(
            data_dir, [(s, s) for s in PEPTIDES],
            num_frames=args.eval_frames, seed=args.seed, rotamers=True,
            path_seed=500, replay_frames=args.train_frames,
        )
    split = os.path.join(data_dir, "split.csv")

    if not args.skip_sample:
        # rollout starts come from the TRAINING data (the distribution the
        # model conditions on); scoring is vs the independent eval path
        run([
            sys.executable, "sim_inference.py", "--sim_ckpt", args.ckpt,
            "--data_dir", args.train_data,
            "--split", os.path.join(args.train_data, "split.csv"),
            "--num_rollouts", str(args.num_rollouts),
            "--out_dir", samp_dir, "--xtc",
        ])

    run([
        sys.executable, "scripts/analyze_peptide_sim.py",
        "--mddir", data_dir, "--pdbdir", samp_dir, "--save", "--no_msm",
        "--no_decorr", "--tica_lag", "100", "--save_name", "out_eval.pkl",
        "--split", split,
    ], env={"JAX_PLATFORMS": "cpu"})

    floor_dir = os.path.join(args.out, "floor")
    if not os.path.exists(
        os.path.join(floor_dir, "samples", "floor.pkl")
    ):
        run([
            sys.executable, "scripts/noise_floor.py", "--mddir", data_dir,
            "--out", floor_dir,
            "--n_gen", str(args.num_rollouts * 100), "--n_paths", "1",
            "--replay_frames", str(args.train_frames),
            "--seed", str(args.seed),
        ], env={"JAX_PLATFORMS": "cpu"})

    model_types, model_tors = summarize(os.path.join(samp_dir, "out_eval.pkl"))
    floor_types, floor_tors = summarize(
        os.path.join(floor_dir, "samples", "floor.pkl")
    )
    table = {
        t: {
            "model": round(model_types[t], 4),
            "floor": round(floor_types.get(t, float("nan")), 4),
            "ratio": round(model_types[t] / floor_types[t], 2)
            if floor_types.get(t) else None,
        }
        for t in sorted(model_types)
    }
    print(json.dumps({
        "mean_torsion_jsd": round(model_tors, 4),
        "floor_torsion_jsd": round(floor_tors, 4),
        "ratio": round(model_tors / floor_tors, 3),
        "per_type": table,
    }, indent=2))
    print("EVAL PROTOCOL OK", flush=True)


if __name__ == "__main__":
    main()

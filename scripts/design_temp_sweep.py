"""Dirichlet-flow temperature sweep for the design task.

The reference stores ``dirichlet_flow_temp`` as a train-time hyperparameter
(`/root/reference/mdgen/parsing.py:105`) consumed only by the Dirichlet-flow
vector field at sampling, so the sweep needs no retraining — we override it
at inference (``design_inference.py --dirichlet_flow_temp``) and score
recovery with the reference metric set (designed / conditioning / consensus
/ mode-pair, `scripts/analyze_peptide_design.py`).

    python scripts/design_temp_sweep.py --ckpt workdir/quality_r2_design \
        --out /tmp/temp_sweep --temps 0.2,0.5,1.0,2.0 --rigid_data
"""
import argparse
import json
import os
import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEPTIDES = ["ACDE", "WYNK", "GSVL", "FHMT", "RQIP", "DKYA", "NEWS", "LCTV"]


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True,
                   help="design run dir (config.json + step_* checkpoints)")
    p.add_argument("--out", type=str, default="/tmp/temp_sweep")
    p.add_argument("--temps", type=str, default="0.2,0.5,1.0,2.0")
    p.add_argument("--md_frames", type=int, default=5000)
    p.add_argument("--num_frames", type=int, default=100)
    p.add_argument("--num_batches", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--tica_lag", type=int, default=100)
    p.add_argument("--msm_lag", type=int, default=10)
    p.add_argument("--rigid_data", action="store_true",
                   help="v1 rigid-sidechain synthetic data (what the round-2 "
                        "design checkpoint was trained on)")
    p.add_argument("--data_dir", type=str, default=None,
                   help="reuse an existing dataset instead of regenerating")
    args = p.parse_args()

    temps = [float(t) for t in args.temps.split(",")]
    os.makedirs(args.out, exist_ok=True)

    data_dir = args.data_dir or os.path.join(args.out, "data")
    split = os.path.join(data_dir, "split.csv")
    if args.data_dir and os.path.exists(split):
        print("reusing dataset:", split, flush=True)
    else:
        from mdgen_tpu.data import write_synthetic_dataset

        split = write_synthetic_dataset(
            data_dir, [(s, s) for s in PEPTIDES], num_frames=args.md_frames,
            seed=0, rotamers=not args.rigid_data,
        )

    results = {}
    msm_dir = None  # first temp's out_dir: its MSM pickles seed the rest
    for temp in temps:
        tdir = os.path.join(args.out, f"temp_{temp:g}")
        os.makedirs(tdir, exist_ok=True)
        if msm_dir is not None:
            # the per-peptide MSM depends only on the MD data — share it
            for s in PEPTIDES:
                src = os.path.join(msm_dir, f"{s}_metadata.pkl")
                dst = os.path.join(tdir, f"{s}_metadata.pkl")
                if os.path.exists(src) and not os.path.exists(dst):
                    os.symlink(src, dst)
        run([
            sys.executable, "design_inference.py", "--sim_ckpt", args.ckpt,
            "--data_dir", data_dir, "--split", split,
            "--num_frames", str(args.num_frames),
            "--num_batches", str(args.num_batches),
            "--batch_size", str(args.batch_size),
            "--tica_lag", str(args.tica_lag),
            "--msm_lag", str(args.msm_lag),
            "--random_start_idx",
            "--dirichlet_flow_temp", str(temp),
            "--out_dir", tdir,
        ])
        msm_dir = msm_dir or tdir
        out = subprocess.run(
            [sys.executable, "scripts/analyze_peptide_design.py",
             "--pdbdir", tdir],
            check=True, cwd=REPO, capture_output=True, text=True,
        )
        print(out.stdout, flush=True)
        # analyze prints "OVERALL: designed X cond Y consensus Z mode-pair W"
        metrics = {}
        for line in out.stdout.splitlines():
            if line.startswith("OVERALL:"):
                toks = line.split()[1:]  # [k1, v1, k2, v2, ...]
                metrics = {toks[i]: float(toks[i + 1])
                           for i in range(0, len(toks), 2)}
        results[temp] = metrics

    with open(os.path.join(args.out, "temp_sweep.json"), "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

"""Quality loop on the real CLI surface: train -> sim_inference -> analyze.

Reproducible evidence for the quality gate (BASELINE.md): trains a 4AA model
on synthetic trajectories with `train.py`, samples rollouts with
`sim_inference.py`, and scores torsion JSDs (scipy-exact, reference
`scripts/analyze_peptide_sim.py` semantics) with `scripts/analyze_peptide_sim.py`.
Everything runs through subprocess CLI calls — the same surface a user of the
reference would drive.

    python scripts/quality_run.py --epochs 6000 --out /tmp/quality_r2
"""
import argparse
import json
import os
import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Subprocesses (train/inference) get the ORIGINAL env — the parent process
# pins itself to CPU below so its in-process jax use (rotamer dataset
# reconstruction) never holds the TPU client while a child needs it (two
# concurrent clients deadlock the tunnel, BENCH.md "Measurement hygiene").
BASE_ENV = dict(os.environ)
os.environ["JAX_PLATFORMS"] = "cpu"

# 8 tetrapeptides with diverse sidechain chemistry (the synthetic generator
# seeds torsion basins per residue identity)
PEPTIDES = ["ACDE", "WYNK", "GSVL", "FHMT", "RQIP", "DKYA", "NEWS", "LCTV"]


def run(cmd, env=None):
    print("+", " ".join(cmd), flush=True)
    e = dict(BASE_ENV)
    if env:
        e.update(env)
    subprocess.run(cmd, check=True, env=e, cwd=REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", type=str, default="sim",
                   choices=["sim", "design", "tps", "upsampling"])
    p.add_argument("--run_name", type=str, default=None,
                   help="workdir run name (default: quality_r2[_design])")
    p.add_argument("--out", type=str, default="/tmp/quality_r2")
    p.add_argument("--epochs", type=int, default=6000)
    p.add_argument("--num_frames", type=int, default=100)
    p.add_argument("--md_frames", type=int, default=5000)
    p.add_argument("--num_rollouts", type=int, default=10)
    p.add_argument("--embed_dim", type=int, default=128)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--mha_heads", type=int, default=8)
    p.add_argument("--ipa_heads", type=int, default=2)
    p.add_argument("--ipa_head_dim", type=int, default=16)
    p.add_argument("--ipa_qk", type=int, default=4)
    p.add_argument("--ipa_v", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--chi_loss_weight", type=float, default=1.0,
                   help="upweight sidechain chi sin/cos loss channels")
    p.add_argument("--chi_loss_weights", type=str, default=None,
                   help="per-chi weights 'w1,w2,w3,w4' forwarded to "
                        "train.py (composes with --chi_loss_weight)")
    p.add_argument("--rigid_data", action="store_true",
                   help="v1 rigid-sidechain synthetic data (delta-function "
                        "chi marginals) instead of rotamer-diverse data")
    p.add_argument("--train_extra", type=str, default="",
                   help="extra flags appended to the train.py invocation, "
                        "e.g. --train_extra '--ema --grad_checkpointing'")
    p.add_argument("--analyze_extra", type=str, default="",
                   help="extra flags appended to the analysis invocation, "
                        "e.g. --analyze_extra='--plot --repdir /tmp/reps'")
    p.add_argument("--skip_train", action="store_true",
                   help="reuse an existing checkpoint in --out")
    p.add_argument("--resume", action="store_true",
                   help="pass --ckpt workdir/{run_name} to train.py so an "
                        "interrupted run restores its newest step_* "
                        "checkpoint (train.py only resumes when --ckpt is "
                        "given explicitly)")
    p.add_argument("--skip_data", action="store_true",
                   help="reuse a prestaged {out}/data dir (must hold the "
                        "same-seed dataset; generation is deterministic, "
                        "so a copy from another run with identical "
                        "--md_frames/peptides is exact)")
    args = p.parse_args()

    data_dir = os.path.join(args.out, "data")
    samp_dir = os.path.join(args.out, "samples")
    os.makedirs(samp_dir, exist_ok=True)
    run_name = args.run_name or f"quality_r2_{args.task}".replace("_sim", "")
    # train.py writes checkpoints to workdir/{run_name} under its cwd
    ckpt_root = os.path.join(REPO, "workdir", run_name)

    # 1. synthetic MD dataset (the "reference MD" side of the JSD)
    split = os.path.join(data_dir, "split.csv")
    if args.skip_data and os.path.exists(split):
        print("reusing prestaged dataset:", split, flush=True)
    else:
        from mdgen_tpu.data import write_synthetic_dataset

        split = write_synthetic_dataset(
            data_dir, [(s, s) for s in PEPTIDES], num_frames=args.md_frames,
            seed=0, rotamers=not args.rigid_data,
        )
    if args.task == "upsampling":
        # the kept (low-framerate) trajectories the upsampler interpolates
        import numpy as np

        for s in PEPTIDES:
            arr = np.load(os.path.join(data_dir, f"{s}.npy"))
            np.save(os.path.join(data_dir, f"{s}_i10.npy"), arr[::10])

    # 2. train via the CLI
    task_flags = {
        "sim": ["--sim_condition"],
        # reference design recipe (README.md:57): inpainting + design,
        # no_aa_emb, no_torsion
        "design": ["--inpainting", "--design", "--no_aa_emb", "--no_torsion"],
        # reference TPS recipe (README.md:51): endpoint conditioning
        "tps": ["--tps_condition"],
        # reference upsampling recipe (README.md:54) scaled to synthetic
        # data: condition on every 10th frame instead of every 100th
        "upsampling": ["--sim_condition", "--cond_interval", "10"],
    }[args.task]
    resume_flags = []
    if args.resume:
        from mdgen_tpu.runtime.checkpoint import latest_step

        if latest_step(ckpt_root) is not None:
            resume_flags = ["--ckpt", ckpt_root]
            print("resuming from", ckpt_root, flush=True)
        else:
            print("no checkpoint to resume in", ckpt_root, flush=True)
    if not args.skip_train:
        run([
            sys.executable, "train.py", *task_flags, "--prepend_ipa",
            "--abs_pos_emb", "--abs_time_emb",
            "--crop", "4", "--num_frames", str(args.num_frames),
            "--num_layers", str(args.num_layers),
            "--embed_dim", str(args.embed_dim),
            "--mha_heads", str(args.mha_heads),
            "--ipa_heads", str(args.ipa_heads),
            "--ipa_head_dim", str(args.ipa_head_dim),
            "--ipa_qk", str(args.ipa_qk), "--ipa_v", str(args.ipa_v),
            "--batch_size", str(args.batch_size), "--lr", str(args.lr),
            "--chi_loss_weight", str(args.chi_loss_weight),
            *(["--chi_loss_weights", args.chi_loss_weights]
              if args.chi_loss_weights else []),
            "--epochs", str(args.epochs),
            "--data_dir", data_dir, "--train_split", split,
            "--val_split", split,
            "--val_epoch_freq", "500", "--val_batches", "1",
            "--ckpt_freq", "1000", "--print_freq", "200",
            "--run_name", run_name, *resume_flags,
            *__import__("shlex").split(args.train_extra),
        ])

    # the inference CLIs take the run dir (config.json + step_* checkpoints)
    # and restore the newest step themselves
    print("using checkpoint dir:", ckpt_root, flush=True)

    if args.task == "upsampling":
        # 3d. fill frames between the kept every-10th frames, score the
        # torsion autocorrelation triplet (truth / generated / naive)
        run([
            sys.executable, "upsampling_inference.py", "--ckpt", ckpt_root,
            "--data_dir", data_dir, "--split", split, "--suffix", "_i10",
            "--out_dir", samp_dir, "--xtc",
        ])
        run([
            sys.executable, "scripts/analyze_upsampling.py",
            "--mddir", data_dir, "--pdbdir", samp_dir,
            "--cond_interval", "10", "--nlag", "100", "--save",
            *__import__("shlex").split(args.analyze_extra),
        ], env={"JAX_PLATFORMS": "cpu"})
        print("QUALITY RUN OK", flush=True)
        return

    if args.task == "tps":
        # 3c. endpoint-conditioned paths between lowest-flux MSM states,
        # scored against discrete bridge samples from the reference MSM
        run([
            sys.executable, "tps_inference.py", "--sim_ckpt", ckpt_root,
            "--data_dir", data_dir, "--split", split,
            "--num_batches", "2", "--batch_size", "8",
            "--tica_lag", "100", "--msm_lag", "10",
            "--out_dir", samp_dir, "--xtc",
        ])
        run([
            sys.executable, "scripts/analyze_peptide_tps.py",
            "--mddir", data_dir, "--pdbdir", samp_dir, "--save",
            *__import__("shlex").split(args.analyze_extra),
        ], env={"JAX_PLATFORMS": "cpu"})
        print("QUALITY RUN OK", flush=True)
        return

    if args.task == "design":
        # 3b. design inference on highest-flux MSM windows + recovery
        run([
            sys.executable, "design_inference.py", "--sim_ckpt", ckpt_root,
            "--data_dir", data_dir, "--split", split,
            "--num_frames", str(args.num_frames),
            "--num_batches", "2", "--batch_size", "16",
            "--tica_lag", "100", "--msm_lag", "10",
            "--random_start_idx",
            "--out_dir", samp_dir,
        ])
        run([
            sys.executable, "scripts/analyze_peptide_design.py",
            "--pdbdir", samp_dir,
            *__import__("shlex").split(args.analyze_extra),
        ], env={"JAX_PLATFORMS": "cpu"})
        print("QUALITY RUN OK", flush=True)
        return

    # 3. sample rollouts via the CLI (T frames x num_rollouts per peptide)
    run([
        sys.executable, "sim_inference.py", "--sim_ckpt", ckpt_root,
        "--data_dir", data_dir, "--split", split,
        "--num_rollouts", str(args.num_rollouts),
        "--out_dir", samp_dir, "--xtc",
    ])

    # 4. analyze via the CLI (scipy-exact JSDs)
    run([
        sys.executable, "scripts/analyze_peptide_sim.py",
        "--mddir", data_dir, "--pdbdir", samp_dir,
        "--save", "--no_msm", "--no_decorr", "--tica_lag", "100",
        "--save_name", "out.pkl", "--split", split,
        *__import__("shlex").split(args.analyze_extra),
    ], env={"JAX_PLATFORMS": "cpu"})

    with open(os.path.join(samp_dir, "out.pkl"), "rb") as fh:
        out = pickle.load(fh)
    tors, alls = {}, {}
    for name, d in out.items():
        jsd = d.get("JSD", {})
        t = [v for k, v in jsd.items() if "|" not in k and not k.startswith("TICA")]
        if t:
            tors[name] = sum(t) / len(t)
        if jsd:
            alls[name] = sum(jsd.values()) / len(jsd)
    print(json.dumps({
        "per_peptide_mean_torsion_jsd": {k: round(v, 4) for k, v in tors.items()},
        "mean_torsion_jsd": round(sum(tors.values()) / max(len(tors), 1), 4),
        "mean_all_jsd": round(sum(alls.values()) / max(len(alls), 1), 4),
    }))
    print("QUALITY RUN OK", flush=True)


if __name__ == "__main__":
    main()

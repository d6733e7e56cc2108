"""Same-system sampling-noise floor for the sim-quality JSD metric.

The rotamer generator's ``seed`` defines the physical SYSTEM (per-torsion
basin occupancies + jump kinetics), so two seeds are two different peptidic
worlds — comparing them measures distribution diversity, not noise. The
floor needs two independent TRAJECTORIES of the same system: both sides are
generated in ``path_seed`` mode (same ``seed`` per peptide, different
``path_seed``), the "MD" side at the training-set length, the "generated"
side at the quality-loop sample count, written through the same PDB+XTC
path ``sim_inference.py --xtc`` uses and scored with
``scripts/analyze_peptide_sim.py``. The resulting JSD is what a PERFECT
model of the dynamics would score at these sample sizes (reference metric
contract: /root/reference/scripts/analyze_peptide_sim.py:51-59).

Caveat: the generated side here is ONE continuous path; the quality loop's
n_rollouts independent rollouts have more effective samples per frame, so
a trained model can legitimately score below this single-path floor. Pass
``--n_paths`` to match the rollout structure (independent path_seeds,
concatenated), which is the apples-to-apples floor.

    python scripts/noise_floor.py --out /tmp/floor_r3 --n_paths 10
"""
import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

PEPTIDES = ["ACDE", "WYNK", "GSVL", "FHMT", "RQIP", "DKYA", "NEWS", "LCTV"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--md_frames", type=int, default=5000)
    p.add_argument("--n_gen", type=int, default=1000,
                   help="total generated-side frames per peptide")
    p.add_argument("--n_paths", type=int, default=1,
                   help="independent generated-side paths (the quality "
                        "loop's num_rollouts analogue); n_gen is split "
                        "across them")
    p.add_argument("--seed", type=int, default=0,
                   help="system seed (quality_run uses 0, i.e. per-peptide "
                        "systems seed+i)")
    p.add_argument("--mddir", type=str, default=None,
                   help="reuse an existing MD-side dataset dir (must be the "
                        "same systems, i.e. same --seed) instead of "
                        "generating one")
    p.add_argument("--replay_frames", type=int, default=None,
                   help="num_frames of an existing DEFAULT-mode dataset "
                        "whose systems both sides should replay (e.g. 5000 "
                        "for the quality_run training sets); without it the "
                        "systems are the path_seed-mode ones")
    args = p.parse_args()

    import numpy as np

    from mdgen_tpu.data import write_synthetic_dataset
    from mdgen_tpu.data.synthetic import synthetic_rotamer_trajectory
    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.protein import save_trajectory

    data_dir = args.mddir or os.path.join(args.out, "data")
    samp_dir = os.path.join(args.out, "samples")
    os.makedirs(samp_dir, exist_ok=True)
    if args.mddir is None:
        # "MD" side: independent long path of each system
        write_synthetic_dataset(
            data_dir, [(s, s) for s in PEPTIDES], num_frames=args.md_frames,
            seed=args.seed, rotamers=True, path_seed=500,
            replay_frames=args.replay_frames,
        )
    # "generated" side: n_paths further independent paths, concatenated
    per = args.n_gen // args.n_paths
    for i, s in enumerate(PEPTIDES):
        parts = [
            synthetic_rotamer_trajectory(
                s, per, seed=args.seed + i, path_seed=900 + 100 * j + i,
                replay_frames=args.replay_frames,
            )
            for j in range(args.n_paths)
        ]
        arr = np.concatenate(parts, 0).astype(np.float32)
        aatype = np.asarray(rc.str_sequence_to_aatype(s))
        save_trajectory(
            arr, aatype, os.path.join(samp_dir, f"{s}.pdb"),
            xtc_path=os.path.join(samp_dir, f"{s}.xtc"),
        )

    cmd = [
        sys.executable, os.path.join(REPO, "scripts/analyze_peptide_sim.py"),
        "--mddir", data_dir, "--pdbdir", samp_dir, "--save", "--no_msm",
        "--no_decorr", "--tica_lag", "100", "--save_name", "floor.pkl",
        "--split", os.path.join(data_dir, "split.csv"),
    ]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


if __name__ == "__main__":
    main()

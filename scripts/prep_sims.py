"""MD preprocessing: raw trajectories -> atom14 float16 .npy memmaps.

Port of reference `scripts/prep_sims.py` (with its ``args.atlas_dir`` vs
``--sim_dir`` bug fixed, reference `scripts/prep_sims.py:67,74`). Two input
paths:
  * XTC + PDB via mdtraj (if installed — not in the baked TPU image)
  * multi-MODEL PDB trajectories via the built-in parser (no dependencies)

Output contract matches the reference: ``{outdir}/{name}{suffix}.npy`` of
shape [T, L, 14, 3], float16, Angstroms (xtc path multiplies nm by 10).
"""
import argparse
import os
import sys
from multiprocessing import Pool

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--split", type=str, required=True)
parser.add_argument("--sim_dir", type=str, required=True)
parser.add_argument("--outdir", type=str, required=True)
parser.add_argument("--suffix", type=str, default="")
parser.add_argument("--stride", type=int, default=1)
parser.add_argument("--atlas", action="store_true")
parser.add_argument("--pdb_traj", action="store_true",
                    help="read {sim_dir}/{name}.pdb multi-MODEL trajectories "
                         "instead of XTC via mdtraj")
parser.add_argument("--num_workers", type=int, default=1)
args = parser.parse_args()

from mdgen_tpu.geometry import constants as rc  # noqa: E402


def xtc_to_atom14(xtc_path: str, top_path: str) -> np.ndarray:
    import mdtraj

    traj = mdtraj.load(xtc_path, top=top_path)
    traj.superpose(traj)
    top = traj.topology
    L = top.n_residues
    out = np.zeros((traj.n_frames, L, 14, 3), dtype=np.float16)
    for res in top.residues:
        names14 = rc.restype_name_to_atom14_names.get(res.name, [""] * 14)
        for atom in res.atoms:
            if atom.name in names14:
                slot = names14.index(atom.name)
                out[:, res.index, slot] = traj.xyz[:, atom.index] * 10.0  # nm->A
    return out


def pdb_traj_to_atom14(path: str) -> np.ndarray:
    from mdgen_tpu.protein import load_pdb_trajectory

    atom14, _ = load_pdb_trajectory(path)
    return atom14.astype(np.float16)


def do_job(job):
    name, out_name = job
    out_path = os.path.join(args.outdir, f"{out_name}{args.suffix}.npy")
    if os.path.exists(out_path):
        return out_name
    if args.pdb_traj:
        arr = pdb_traj_to_atom14(os.path.join(args.sim_dir, f"{name}.pdb"))
    else:
        arr = xtc_to_atom14(
            os.path.join(args.sim_dir, name, f"{name}.xtc"),
            os.path.join(args.sim_dir, name, f"{name}.pdb"),
        )
    np.save(out_path, arr[:: args.stride])
    return out_name


def main():
    os.makedirs(args.outdir, exist_ok=True)
    df = pd.read_csv(args.split, index_col="name")
    jobs = []
    for name in df.index:
        if args.atlas:
            for rep in (1, 2, 3):
                jobs.append((f"{name}_prod_R{rep}_fit", f"{name}_R{rep}"))
        else:
            jobs.append((name, name))

    if args.num_workers > 1:
        with Pool(args.num_workers) as pool:
            for done in pool.imap(do_job, jobs):
                print("done", done)
    else:
        for job in jobs:
            print("done", do_job(job))


if __name__ == "__main__":
    main()

"""TPS evaluation: path likelihood under the reference MSM, valid-path rate,
and JSD of visited-state distributions vs exact bridge samples.

Port of reference `scripts/analyze_peptide_tps.py:63-83` onto the NumPy
toolkit, consuming tps_inference.py outputs (per-sample PDBs + metadata.json
+ cached MSM pickle).
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--mddir", type=str, required=True,
                    help="reference MD atom14 .npy directory")
parser.add_argument("--pdbdir", type=str, required=True,
                    help="tps_inference output dir")
parser.add_argument("--suffix", type=str, default="")
parser.add_argument("--pdb_id", nargs="*", default=[])
parser.add_argument("--n_bridge_samples", type=int, default=1000)
parser.add_argument("--save", action="store_true")
parser.add_argument("--save_name", type=str, default="tps_out.pkl")
args = parser.parse_args()

from mdgen_tpu.analysis import (  # noqa: E402
    featurize_torsions,
    get_state_probs,
    get_tp_likelihood,
    jensen_shannon,
    sample_tp,
)
from mdgen_tpu.protein import load_trajectory  # noqa: E402


def discretize_traj(atom14, aatype, meta):
    feats = featurize_torsions(atom14, aatype, sidechains=True, cossin=True)
    y = meta["tica"].transform(feats)
    return meta["msm"].metastable_assignments[meta["kmeans"].transform(y)]


def main(name):
    with open(f"{args.pdbdir}/{name}_metadata.pkl", "rb") as fh:
        meta = pickle.load(fh)
    with open(f"{args.pdbdir}/{name}_metadata.json") as fh:
        samples_meta = json.load(fh)

    cmsm = meta["cmsm"]
    trans = np.eye(10)
    trans[np.ix_(cmsm.active_set, cmsm.active_set)] = cmsm.transition_matrix

    paths, aatype = [], None
    for m in samples_meta:
        atom14, aatype = load_trajectory(m["path"])
        paths.append(discretize_traj(atom14, aatype, meta))
    paths = np.stack(paths)  # [S, T]
    start_state = samples_meta[0]["start_state"]
    end_state = samples_meta[0]["end_state"]

    out = {}
    # per-path stepwise likelihoods under the reference coarse MSM bridge
    lik = get_tp_likelihood(paths, trans)
    path_probs = lik.prod(axis=1)
    out["mean_log_path_likelihood"] = float(
        np.mean(np.log(np.maximum(path_probs, 1e-300)))
    )
    valid = (paths[:, 0] == start_state) & (paths[:, -1] == end_state)
    out["valid_path_rate"] = float(valid.mean())

    # visited-state distribution vs exact bridge samples
    bridges = sample_tp(
        trans, start_state, end_state, paths.shape[1], args.n_bridge_samples
    )
    out["visited_state_jsd"] = jensen_shannon(
        get_state_probs(paths), get_state_probs(bridges)
    )
    return name, out


if args.pdb_id:
    names = args.pdb_id
else:
    names = [
        f.replace("_metadata.json", "")
        for f in os.listdir(args.pdbdir)
        if f.endswith("_metadata.json")
    ]

results = {}
for n in names:
    try:
        k, v = main(n)
        results[k] = v
        print(n, v)
    except Exception as e:  # noqa: BLE001
        print("ERROR", n, e)

if args.save:
    with open(os.path.join(args.pdbdir, args.save_name), "wb") as fh:
        pickle.dump(results, fh)

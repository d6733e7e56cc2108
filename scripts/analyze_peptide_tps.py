"""TPS evaluation, metric-identical to the reference.

Definition contract (reference `scripts/analyze_peptide_tps.py:63-131`):
generated paths are subsampled ``::10`` with the last frame appended,
mapped through the cMSM active set (highest-pi fallback), and scored as
bridge likelihoods under the ACTIVE-set transition matrix; reported as
``gen_prob`` / ``gen_valid_prob`` / ``gen_valid_rate = (prob > 0).mean()`` /
``gen_JSD`` (visited-state distribution vs 1000 exact cMSM bridges).
With ``--repdir``, replica-MD trajectories truncated to 2-100ns provide the
"how much plain MD buys" baselines (``{len}_rep_*`` keys).

Extra diagnostic kept from earlier rounds (NOT a reference metric):
``endpoint_match_rate`` — fraction of full-length paths whose first/last
frames discretize to the requested endpoint states.
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
parser.add_argument("--repdir", type=str, default=None,
                    help="replica MD .npy directory for the 2-100ns "
                         "baselines (reference --repdir)")
parser.add_argument("--suffix", type=str, default="")
parser.add_argument("--pdb_id", nargs="*", default=[])
parser.add_argument("--n_bridge_samples", type=int, default=1000)
parser.add_argument("--rep_lens", type=str,
                    default="999999,500000,300000,200000,100000,50000,20000",
                    help="replica truncation lengths in frames "
                         "(reference: 100ns..2ns at 0.1ps/frame)")
parser.add_argument("--rep_names", type=str,
                    default="100ns,50ns,30ns,20ns,10ns,5ns,2ns")
parser.add_argument("--rep_msm_lag", type=int, default=1000)
parser.add_argument("--save", action="store_true")
parser.add_argument("--save_name", type=str, default="tps_out.pkl")
args = parser.parse_args()

from mdgen_tpu.analysis import (  # noqa: E402
    featurize_torsions,
    reference_replica_metrics,
    reference_tps_metrics,
)
from mdgen_tpu.protein import load_trajectory  # noqa: E402


def discretize_traj(atom14, aatype, meta):
    feats = featurize_torsions(atom14, aatype, sidechains=True, cossin=True)
    y = meta["tica"].transform(feats)
    return meta["msm"].metastable_assignments[meta["kmeans"].transform(y)]


def main(name):
    rng = np.random.default_rng(137)
    with open(f"{args.pdbdir}/{name}_metadata.pkl", "rb") as fh:
        meta = pickle.load(fh)
    with open(f"{args.pdbdir}/{name}_metadata.json") as fh:
        samples_meta = json.load(fh)

    cmsm = meta["cmsm"]
    paths, aatype = [], None
    for m in samples_meta:
        atom14, aatype = load_trajectory(m["path"])
        paths.append(discretize_traj(atom14, aatype, meta))
    paths = np.stack(paths)  # [S, T] metastable labels
    start_state = samples_meta[0]["start_state"]
    end_state = samples_meta[0]["end_state"]

    out, ref_stateprobs, gen_tp = reference_tps_metrics(
        paths, cmsm, start_state, end_state,
        n_bridge_samples=args.n_bridge_samples, rng=rng,
    )
    # diagnostic only (rounds 1-2 definition; not a reference metric)
    out["endpoint_match_rate"] = float(
        ((paths[:, 0] == start_state) & (paths[:, -1] == end_state)).mean()
    )

    if args.repdir is not None:
        rep_path = os.path.join(args.repdir, f"{name}{args.suffix}.npy")
        rep14 = np.asarray(
            np.lib.format.open_memmap(rep_path, mode="r"), np.float32
        )
        rep_discrete = discretize_traj(rep14, aatype, meta)
        rep_out, _ = reference_replica_metrics(
            rep_discrete, cmsm, start_state, end_state, ref_stateprobs,
            rep_lens=[int(x) for x in args.rep_lens.split(",")],
            rep_names=args.rep_names.split(","),
            msm_lag=args.rep_msm_lag,
            traj_len=gen_tp.shape[1],
            n_samples=args.n_bridge_samples,
            rng=rng,
        )
        out.update(rep_out)
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

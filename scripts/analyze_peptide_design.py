"""Design evaluation: sequence-recovery rates from design metadata JSONs.

Port of reference `scripts/analyze_peptide_design.py:27-96`: recovery on
designed positions, conditioning positions, per-position consensus, and the
most-frequent middle-pair variant.
"""
import argparse
import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--pdbdir", type=str, required=True,
                    help="design_inference output dir")
parser.add_argument("--pdb_id", nargs="*", default=[])
args = parser.parse_args()

from mdgen_tpu.tasks import COND_IDX, DESIGN_IDX  # noqa: E402

if args.pdb_id:
    names = args.pdb_id
else:
    names = [
        f.replace("_metadata.json", "")
        for f in os.listdir(args.pdbdir)
        if f.endswith("_metadata.json")
    ]

design_recs, cond_recs, consensus_recs, mode_recs = [], [], [], []
for name in names:
    with open(f"{args.pdbdir}/{name}_metadata.json") as fh:
        meta = json.load(fh)
    true_seq = meta[0]["seqres"]
    preds = [m["aa_out"] for m in meta]

    d_hits = [
        np.mean([p[i] == true_seq[i] for i in DESIGN_IDX]) for p in preds
    ]
    c_hits = [np.mean([p[i] == true_seq[i] for i in COND_IDX]) for p in preds]
    design_recs.append(np.mean(d_hits))
    cond_recs.append(np.mean(c_hits))

    # per-position consensus
    cons = "".join(
        Counter(p[i] for p in preds).most_common(1)[0][0]
        for i in range(len(true_seq))
    )
    consensus_recs.append(
        np.mean([cons[i] == true_seq[i] for i in DESIGN_IDX])
    )
    # most frequent designed middle pair
    pair = Counter("".join(p[i] for i in DESIGN_IDX) for p in preds).most_common(1)[0][0]
    truth_pair = "".join(true_seq[i] for i in DESIGN_IDX)
    mode_recs.append(
        np.mean([pair[k] == truth_pair[k] for k in range(len(pair))])
    )
    print(
        f"{name}: designed {design_recs[-1]:.3f} cond {cond_recs[-1]:.3f} "
        f"consensus {consensus_recs[-1]:.3f} mode-pair {mode_recs[-1]:.3f}"
    )

print(
    f"OVERALL: designed {np.mean(design_recs):.4f} cond {np.mean(cond_recs):.4f} "
    f"consensus {np.mean(consensus_recs):.4f} mode-pair {np.mean(mode_recs):.4f}"
)

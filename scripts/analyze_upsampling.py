"""Upsampling evaluation: torsion autocorrelation of upsampled trajectories
vs full-framerate ground truth vs the naive subsample.

Port of reference `scripts/analyze_upsampling.py:15-66`.
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--mddir", type=str, required=True,
                    help="full-framerate reference MD atom14 .npy dir")
parser.add_argument("--pdbdir", type=str, required=True,
                    help="upsampling_inference output dir")
parser.add_argument("--suffix", type=str, default="")
parser.add_argument("--cond_interval", type=int, default=100)
parser.add_argument("--nlag", type=int, default=1000)
parser.add_argument("--pdb_id", nargs="*", default=[])
parser.add_argument("--save", action="store_true")
parser.add_argument("--save_name", type=str, default="upsampling_out.pkl")
parser.add_argument("--plot", action="store_true",
                    help="write {pdbdir}/{name}_decorr.pdf: sidechain/"
                         "backbone autocorrelation panels — MD solid, "
                         "naive subsample scatter, generated dashed "
                         "(reference scripts/analyze_upsampling.py:31-57)")
args = parser.parse_args()

from mdgen_tpu.analysis.featurize import torsion_angles  # noqa: E402
from mdgen_tpu.analysis.metrics import torsion_decorrelation_curve  # noqa: E402
from mdgen_tpu.protein import load_trajectory  # noqa: E402


def main(name):
    gen_atom14, aatype = load_trajectory(f"{args.pdbdir}/{name}.pdb")
    ref_atom14 = np.asarray(
        np.lib.format.open_memmap(f"{args.mddir}/{name}{args.suffix}.npy", "r"),
        dtype=np.float32,
    )

    gen_ang, mask = torsion_angles(gen_atom14, aatype)
    ref_ang, _ = torsion_angles(ref_atom14, aatype)
    sub_ang = ref_ang[:: args.cond_interval]

    out = {"backbone": {}, "sidechain": {}}
    L = gen_ang.shape[1]
    for l in range(L):
        for k in range(7):
            if mask[l, k] < 0.5:
                continue
            key = f"res{l}_tor{k}"
            section = "backbone" if k < 3 else "sidechain"
            out[section][key] = {
                "truth": torsion_decorrelation_curve(
                    ref_ang[:, l, k], args.nlag
                ).astype(np.float16),
                "gen": torsion_decorrelation_curve(
                    gen_ang[:, l, k], min(args.nlag, len(gen_ang) - 2)
                ).astype(np.float16),
                "naive": torsion_decorrelation_curve(
                    sub_ang[:, l, k], min(args.nlag // args.cond_interval,
                                          len(sub_ang) - 2)
                ).astype(np.float16),
            }

    if args.plot:
        make_plot(name, out)
    return name, out


def make_plot(name, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    colors = plt.rcParams["axes.prop_cycle"].by_key()["color"]
    fig, axs = plt.subplots(1, 2, figsize=(10, 5))
    for ax, section, title in (
        (axs[0], "sidechain", "sidechains"),
        (axs[1], "backbone", "backbone"),
    ):
        for i, (key, d) in enumerate(sorted(out[section].items())):
            c = colors[i % len(colors)]
            truth = np.asarray(d["truth"], np.float32)[1:]
            ax.plot(1 + np.arange(len(truth)), truth, color=c)
            naive = np.asarray(d["naive"], np.float32)[1:]
            ax.scatter(args.cond_interval * (1 + np.arange(len(naive))),
                       naive, color=c, label=key, s=12)
            gen = np.asarray(d["gen"], np.float32)[1:]
            ax.plot(1 + np.arange(len(gen)), gen, color=c, linestyle="--")
        ax.set_title(f"{name} {title}")
        ax.set_xscale("log")
        ax.set_xlabel("frames")
        ax.set_ylabel("autocorrelation")
        ax.legend(loc="upper center", bbox_to_anchor=(0.5, -0.12),
                  ncol=3, fontsize=6)
    fig.tight_layout()
    path = os.path.join(args.pdbdir, f"{name}_decorr.pdf")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    print("plot ->", path)


if args.pdb_id:
    names = args.pdb_id
else:
    names = [
        f.split(".")[0] for f in os.listdir(args.pdbdir) if f.endswith(".pdb")
    ]

results = {}
for n in names:
    try:
        k, v = main(n)
        results[k] = v
        print("done", n)
    except Exception as e:  # noqa: BLE001
        print("ERROR", n, e)

if args.save:
    with open(os.path.join(args.pdbdir, args.save_name), "wb") as fh:
        pickle.dump(results, fh)

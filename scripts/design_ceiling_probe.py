"""Probe: is the 0.70 val categorical design recovery a DATA ceiling or a
MODEL limitation?

Context (BENCH.md "34M design quality run"): scaling 2.4M -> 34M moved the
generative designed-position recovery (0.113 -> 0.1445) but the val-time
categorical recovery stayed at 0.70. This script establishes the
information ceiling of the synthetic design protocol directly, without any
trained model.

What the design-recipe model actually sees (reference recipe
`/root/reference/README.md:57`: --inpainting --design --no_aa_emb
--no_torsion):

- torsion latent channels are ZEROED (``no_torsion``, tasks.py:112);
- ``no_aa_emb`` removes the aatype embedding, so conditioning residues'
  identities reach the model only through the Dirichlet simplex channels
  being transported — which START AT NOISE at inference for every residue;
- the synthetic generator draws per-torsion basin occupancies and dwell
  times independent of residue identity (data/synthetic.py:215-218), so
  frame dynamics carry no *generalizing* aa signal.

The only aa signal left is MEMORIZATION: the quality protocol scores
val == train (8 fixed tetrapeptides), and the conditioning residues'
offset trajectories (x_cond: residues [0,3] of every frame, offsets
relative to window frame 0 — tasks.py:98,148-150) are continuous values
unique to each peptide's trajectory. An oracle that identifies the source
peptide from exactly that x_cond information and reads the designed
positions off the training sequence realizes the ceiling.

This script measures that oracle: 1-NN matching of a window's
conditioning-residue offset trajectory against all training windows.
If it scores ~1.0, the data ceiling is 1.0 and the model's 0.70 is a
model/sampling limitation (the jointly-sampled sequence simplex hedges
across peptides rather than fully exploiting trajectory identity).

Analytic floors printed for scale:
- chance: 1/20 = 0.05
- sequence-marginal only (no structure): per-position argmax over the 8
  training peptides' designed positions.

Usage:  JAX_PLATFORMS=cpu python scripts/design_ceiling_probe.py
"""
import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# the quality-loop protocol's fixed peptides (scripts/quality_run.py)
PEPTIDES = ["ACDE", "WYNK", "GSVL", "FHMT", "RQIP", "DKYA", "NEWS", "LCTV"]
COND_IDX = [0, 3]
DESIGN_IDX = [1, 2]


def window_features(trans, rots, starts, T_win, stride):
    """Conditioning-residue offset trajectories for windows at ``starts``.

    Exactly the x_cond information: per-frame rigid offsets relative to the
    window's first frame, restricted to residues COND_IDX, subsampled every
    ``stride`` frames. Returns [N, F] float32.
    """
    import jax.numpy as jnp

    from mdgen_tpu.geometry import Rigid, get_offsets

    feats = []
    sel = np.asarray(COND_IDX)
    for s in starts:
        r = Rigid(
            jnp.asarray(rots[s : s + T_win, sel]),
            jnp.asarray(trans[s : s + T_win, sel]),
        )
        off = np.asarray(get_offsets(r[0:1], r))  # [T, 2, 7]
        feats.append(off[::stride].reshape(-1))
    return np.stack(feats).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--md_frames", type=int, default=5000)
    p.add_argument("--num_frames", type=int, default=100,
                   help="window length (the design recipe trains at T=100)")
    p.add_argument("--stride", type=int, default=10,
                   help="frame subsample inside the feature")
    p.add_argument("--n_queries", type=int, default=64,
                   help="random val windows per peptide")
    p.add_argument("--library_stride", type=int, default=7,
                   help="training-window start stride for the 1-NN library "
                        "(deliberately NOT aligned with query starts)")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()

    import jax.numpy as jnp

    from mdgen_tpu.data import write_synthetic_dataset
    from mdgen_tpu.geometry.constants import str_sequence_to_aatype
    from mdgen_tpu.runtime import tokenize_atom14

    rng = np.random.default_rng(args.seed)

    with tempfile.TemporaryDirectory() as d:
        write_synthetic_dataset(
            d, [(s, s) for s in PEPTIDES], num_frames=args.md_frames,
            seed=0, rotamers=True,
        )
        toks = {}
        for name in PEPTIDES:
            arr = np.load(os.path.join(d, f"{name}.npy")).astype(np.float32)
            L = arr.shape[1]
            tok = tokenize_atom14({
                "atom14": jnp.asarray(arr[None]),
                "seqres": jnp.asarray(
                    np.asarray(str_sequence_to_aatype(name))[None]
                ),
                "mask": jnp.ones((1, L), jnp.float32),
            })
            toks[name] = {
                "trans": np.asarray(tok["trans"][0]),
                "rots": np.asarray(tok["rots"][0]),
            }

    T_win = args.num_frames
    T_max = args.md_frames - T_win

    # library: all peptides, strided window starts
    lib_feats, lib_pep = [], []
    for pi, name in enumerate(PEPTIDES):
        starts = np.arange(0, T_max, args.library_stride)
        f = window_features(
            toks[name]["trans"], toks[name]["rots"], starts, T_win, args.stride
        )
        lib_feats.append(f)
        lib_pep.extend([pi] * len(starts))
    lib_feats = np.concatenate(lib_feats)
    lib_pep = np.asarray(lib_pep)
    print(f"library: {len(lib_pep)} windows, feature dim {lib_feats.shape[1]}")

    # queries: random (unaligned) val windows, like the Loader samples
    aatypes = np.stack([np.asarray(str_sequence_to_aatype(s)) for s in PEPTIDES])
    n_correct_pep = 0
    n_correct_aa, n_total_aa = 0, 0
    for pi, name in enumerate(PEPTIDES):
        starts = rng.integers(0, T_max, size=args.n_queries)
        q = window_features(
            toks[name]["trans"], toks[name]["rots"], starts, T_win, args.stride
        )
        # 1-NN in L2 over the cond-residue offset trajectory
        d2 = ((q[:, None] - lib_feats[None]) ** 2).sum(-1)  # [Nq, Nlib]
        nn = lib_pep[np.argmin(d2, axis=1)]
        n_correct_pep += int((nn == pi).sum())
        pred_aa = aatypes[nn][:, DESIGN_IDX]  # [Nq, 2]
        true_aa = aatypes[pi][DESIGN_IDX][None]
        n_correct_aa += int((pred_aa == true_aa).sum())
        n_total_aa += pred_aa.size

    oracle_recovery = n_correct_aa / n_total_aa
    pep_id_acc = n_correct_pep / (len(PEPTIDES) * args.n_queries)

    # analytic: sequence-marginal-only baseline
    marg = 0.0
    for j in DESIGN_IDX:
        vals, counts = np.unique(aatypes[:, j], return_counts=True)
        marg += counts.max() / len(PEPTIDES)
    marg /= len(DESIGN_IDX)

    print(json.dumps({
        "oracle_designed_recovery": round(oracle_recovery, 4),
        "oracle_peptide_id_accuracy": round(pep_id_acc, 4),
        "marginal_only_recovery": round(marg, 4),
        "chance": 0.05,
        "model_val_categorical (BENCH.md)": 0.70,
        "verdict": (
            "data ceiling ~= oracle; 0.70 is a model/sampling limitation"
            if oracle_recovery > 0.95 else
            "0.70 is near the data ceiling"
        ),
    }, indent=2))


if __name__ == "__main__":
    main()

"""Torsion featurization from raw coordinates (host-side NumPy/JAX).

Equivalent of the reference's PyEMMA featurizer usage (reference
`mdgen/analysis.py:8-29`): backbone torsions (phi, psi) +/- sidechain chis,
as cos/sin pairs, computed directly from atom14 trajectories with the same
geometry kernels the model uses — no PDB/XTC round-trip.
"""
from __future__ import annotations

import numpy as np

from ..geometry import atom14_to_atom37, atom37_to_torsions
from ..geometry import constants as rc

# torsion tensor layout: [omega, phi, psi, chi1..chi4]
_PHI, _PSI = 1, 2


def featurize_torsions(
    atom14: np.ndarray,
    aatype: np.ndarray,
    sidechains: bool = False,
    cossin: bool = True,
):
    """atom14 [T, L, 14, 3], aatype [L] -> features [T, F].

    Backbone: phi (residues 1..L-1) and psi (residues 0..L-2). Sidechains:
    chi1..4 where defined by residue type. cossin=True emits (cos, sin) pairs
    (pyemma's convention), else wrapped angles.
    """
    T, L = atom14.shape[:2]
    aatype_tl = np.broadcast_to(np.asarray(aatype), (T, L))
    atom37 = np.asarray(atom14_to_atom37(atom14, aatype_tl))
    torsions, torsion_mask = atom37_to_torsions(atom37, aatype_tl)
    torsions = np.asarray(torsions)  # [T, L, 7, 2] (sin, cos)

    res_idx, tor_idx = _feature_index_arrays(np.asarray(aatype), sidechains)
    out = torsions[:, res_idx, tor_idx, :]  # [T, F, 2]
    if cossin:
        # pyemma emits (cos, sin); our torsions are (sin, cos)
        return out[..., ::-1].reshape(T, -1)
    return np.arctan2(out[..., 0], out[..., 1]).reshape(T, -1)


def _feature_index_arrays(aatype: np.ndarray, sidechains: bool):
    """(residue, torsion) gather indices in pyemma's feature order.

    pyemma's ``add_backbone_torsions`` sorts dihedrals by first atom index,
    which interleaves by residue: psi_0, phi_1, psi_1, ..., phi_{L-1}
    (phi_i starts at C(i-1), psi_i at N(i)). The reference relies on this:
    its 2D Ramachandran JSDs pair features i, i+1 for i in {1, 3}, which
    are (phi_i, psi_i) of one residue only under the interleaved order
    (reference `scripts/analyze_peptide_sim.py:57-59`).
    ``add_sidechain_torsions`` then appends chi1 for all residues, chi2, ...
    """
    L = len(aatype)
    pairs = []
    for i in range(L):
        if i > 0:
            pairs.append((i, _PHI))
        if i < L - 1:
            pairs.append((i, _PSI))
    if sidechains:
        chi_mask = rc.chi_angles_mask_with_unk[aatype]  # [L, 4]
        for k in range(4):
            for i in np.nonzero(chi_mask[:, k] > 0.5)[0]:
                pairs.append((int(i), 3 + k))
    res_idx = np.array([p[0] for p in pairs], np.int64)
    tor_idx = np.array([p[1] for p in pairs], np.int64)
    return res_idx, tor_idx


_TORSION_NAMES = ["OMEGA", "PHI", "PSI", "CHI1", "CHI2", "CHI3", "CHI4"]


def describe_features(aatype: np.ndarray, sidechains: bool = False,
                      cossin: bool = False):
    """Feature labels in the same order ``featurize_torsions`` emits them,
    pyemma-style: ``"PHI 0 ALA 1"``; cossin doubles each into
    COS(...)/SIN(...) pairs (reference `mdgen/analysis.py:8-21` describe())."""
    aatype = np.asarray(aatype)
    res_idx, tor_idx = _feature_index_arrays(aatype, sidechains)
    labels = [
        f"{_TORSION_NAMES[t]} 0 {rc.restype_1to3.get(rc.restypes_with_x[aatype[r]], 'UNK')} {r}"
        for r, t in zip(res_idx, tor_idx)
    ]
    if cossin:
        return [f"{fn}({lab})" for lab in labels for fn in ("COS", "SIN")]
    return labels


def torsion_angles(atom14: np.ndarray, aatype: np.ndarray):
    """All 7 torsions as wrapped angles + validity mask:
    ([T, L, 7], [L, 7])."""
    T, L = atom14.shape[:2]
    aatype_tl = np.broadcast_to(np.asarray(aatype), (T, L))
    atom37 = np.asarray(atom14_to_atom37(atom14, aatype_tl))
    torsions, torsion_mask = atom37_to_torsions(atom37, aatype_tl)
    torsions = np.asarray(torsions)
    angles = np.arctan2(torsions[..., 0], torsions[..., 1])
    return angles, np.asarray(torsion_mask)[0]

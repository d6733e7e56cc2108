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
    mask = np.asarray(torsion_mask)[0]  # [L, 7]

    feats = []
    # phi: undefined for residue 0; psi: undefined for the last residue
    sel = [(slice(1, None), _PHI), (slice(0, L - 1), _PSI)]
    for rs, tor in sel:
        sincos = torsions[:, rs, tor, :]  # [T, l, 2]
        feats.append(sincos)
    if sidechains:
        chi_mask = rc.chi_angles_mask_with_unk[np.asarray(aatype)]  # [L, 4]
        for k in range(4):
            idx = np.nonzero(chi_mask[:, k] > 0.5)[0]
            if len(idx):
                feats.append(torsions[:, idx, 3 + k, :])

    out = np.concatenate([f.reshape(T, -1, 2) for f in feats], axis=1)
    if cossin:
        # pyemma emits (cos, sin); our torsions are (sin, cos)
        return out[..., ::-1].reshape(T, -1)
    return np.arctan2(out[..., 0], out[..., 1]).reshape(T, -1)


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

"""Synthetic peptide trajectories for tests, overfit checks, and benchmarks.

Generates physically-plausible atom14 trajectories by placing idealized
literature geometry with smoothly-evolving backbone frames and torsions —
the same generative contract as real preprocessed MD (fp16 Angstroms), so
the entire pipeline (tokenize -> train -> sample -> reconstruct -> analyze)
can run end-to-end without MD data. Replaces the reference's reliance on
pre-downloaded simulation archives for smoke testing (the reference has no
equivalent; its debug path is ``--overfit`` on real data,
reference `mdgen/dataset.py:21-29`).
"""
from __future__ import annotations

import os

import numpy as np

from ..geometry import constants as rc


def _smooth_noise(rng, T, shape, smooth=20):
    """Temporally-smooth gaussian noise via moving average."""
    x = rng.normal(size=(T + smooth, *shape))
    kernel = np.ones(smooth) / smooth
    x = np.apply_along_axis(lambda v: np.convolve(v, kernel, mode="valid"), 0, x)
    return x[:T]


def synthetic_trajectory(seqres: str, num_frames: int, seed: int = 0) -> np.ndarray:
    """Build a [T, L, 14, 3] float16 atom14 trajectory for a sequence.

    Residues are laid out along x with slowly-varying random rotations and
    jittered torsion-free sidechain placement (idealized literature atoms in
    the rotated frame).
    """
    rng = np.random.default_rng(seed)
    aatype = rc.str_sequence_to_aatype(seqres)
    L = len(aatype)
    T = num_frames

    lit = rc.restype_atom14_rigid_group_positions[aatype]  # L, 14, 3
    mask = rc.restype_atom14_mask[aatype][..., None]  # L, 14, 1

    # smooth per-residue rotation angles and translations over time
    angles = _smooth_noise(rng, T, (L, 3), smooth=16) * 0.8
    offsets = _smooth_noise(rng, T, (L, 3), smooth=16) * 1.5

    out = np.zeros((T, L, 14, 3), dtype=np.float32)
    base = np.stack(
        [np.arange(L) * 3.8, np.zeros(L), np.zeros(L)], axis=-1
    )  # extended chain spacing
    for t in range(T):
        cx, sx = np.cos(angles[t, :, 0]), np.sin(angles[t, :, 0])
        cy, sy = np.cos(angles[t, :, 1]), np.sin(angles[t, :, 1])
        cz, sz = np.cos(angles[t, :, 2]), np.sin(angles[t, :, 2])
        Rx = np.zeros((L, 3, 3))
        Rx[:, 0, 0] = 1
        Rx[:, 1, 1], Rx[:, 1, 2] = cx, -sx
        Rx[:, 2, 1], Rx[:, 2, 2] = sx, cx
        Ry = np.zeros((L, 3, 3))
        Ry[:, 1, 1] = 1
        Ry[:, 0, 0], Ry[:, 0, 2] = cy, sy
        Ry[:, 2, 0], Ry[:, 2, 2] = -sy, cy
        Rz = np.zeros((L, 3, 3))
        Rz[:, 2, 2] = 1
        Rz[:, 0, 0], Rz[:, 0, 1] = cz, -sz
        Rz[:, 1, 0], Rz[:, 1, 1] = sz, cz
        R = Rx @ Ry @ Rz
        pos = np.einsum("lij,laj->lai", R, lit) + (base + offsets[t])[:, None]
        out[t] = pos * mask
    return out.astype(np.float16)


def write_synthetic_dataset(
    out_dir: str,
    names_seqs: list[tuple[str, str]],
    num_frames: int,
    suffix: str = "",
    seed: int = 0,
) -> str:
    """Write ``.npy`` memmaps + a split CSV; returns the CSV path."""
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for i, (name, seq) in enumerate(names_seqs):
        traj = synthetic_trajectory(seq, num_frames, seed=seed + i)
        np.save(os.path.join(out_dir, f"{name}{suffix}.npy"), traj)
        rows.append(f"{name},{seq}")
    csv_path = os.path.join(out_dir, "split.csv")
    with open(csv_path, "w") as fh:
        fh.write("name,seqres\n" + "\n".join(rows) + "\n")
    return csv_path

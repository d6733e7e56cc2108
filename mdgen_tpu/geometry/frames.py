"""Atom-layout conversions and (frames, torsions) tokenization, pure jnp.

Behavioral parity with the reference tokenizer (reference
`mdgen/geometry.py:9,30,61,82,218,236,273`), re-expressed as vectorized
gathers / einsums that XLA maps onto the TPU VPU/MXU. Every function is pure
and jit/vmap/scan-safe; constant tables are closed over as device constants.

Layout conventions:
  * atom14: per-residue compact layout; slots 0..3 are always N, CA, C, O
  * atom37: AF2 fixed atom-type layout
  * torsions: 7 angles (omega, phi, psi, chi1..chi4) as (sin, cos) pairs
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as rc
from .rigid import Rigid

# Device-constant tables (closed over at trace time)
_A14_TO_A37 = jnp.asarray(rc.RESTYPE_ATOM14_TO_ATOM37)  # [21, 14]
_A37_TO_A14 = jnp.asarray(rc.RESTYPE_ATOM37_TO_ATOM14)  # [21, 37]
_A14_MASK = jnp.asarray(rc.RESTYPE_ATOM14_MASK)  # [21, 14]
_A37_MASK = jnp.asarray(rc.RESTYPE_ATOM37_MASK)  # [21, 37]
_CHI_IDX37 = jnp.asarray(rc.chi_atom37_indices)  # [21, 4, 4]
_CHI_MASK = jnp.asarray(rc.chi_angles_mask_with_unk)  # [21, 4]
_DEFAULT_FRAMES = jnp.asarray(rc.restype_rigid_group_default_frame)  # [21, 8, 4, 4]
_GROUP_IDX = jnp.asarray(rc.restype_atom14_to_rigid_group)  # [21, 14]
_LIT_POSITIONS = jnp.asarray(rc.restype_atom14_rigid_group_positions)  # [21,14,3]

# Backbone frame axis-flip: diag(-1, 1, -1) (reference `mdgen/geometry.py:227-230`)
_BB_FLIP = jnp.asarray(np.diag([-1.0, 1.0, -1.0]).astype(np.float32))

# Per-torsion sign convention: psi sin/cos gets mirrored
# (reference `mdgen/geometry.py:195-200`)
_TORSION_SIGN = jnp.asarray([1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0])


def _align_aatype(aatype, pos, n_pos_dims=2):
    """Broadcast aatype up to pos.shape[:-n_pos_dims] (so callers may pass
    [L] against [T, L, A, 3], matching the reference's flexibility)."""
    target = pos.shape[: pos.ndim - n_pos_dims]
    return jnp.broadcast_to(jnp.asarray(aatype), target)


def _gather_atoms(pos, idx):
    """Gather atoms: pos [..., A, 3], idx [..., M] -> [..., M, 3]."""
    return jnp.take_along_axis(
        pos, jnp.broadcast_to(idx[..., None], (*idx.shape, 3)), axis=-2
    )


def _gather_scalars(x, idx):
    """Gather along the atom axis: x [..., A], idx [..., M] -> [..., M]."""
    return jnp.take_along_axis(x, idx, axis=-1)


# ---------------------------------------------------------------------------
# atom14 <-> atom37
# ---------------------------------------------------------------------------


def atom14_to_atom37(atom14, aatype, atom14_mask=None):
    """[..., L, 14, 3] -> [..., L, 37, 3] relayout by residue type.

    ``aatype``: integer [..., L] (broadcastable against the residue axis).
    """
    atom14 = jnp.asarray(atom14)
    aatype = _align_aatype(aatype, atom14)
    idx = _A37_TO_A14[aatype]  # [..., L, 37]
    atom37 = _gather_atoms(atom14, idx)
    atom37 = atom37 * _A37_MASK[aatype][..., None]
    if atom14_mask is not None:
        mask37 = _gather_scalars(jnp.asarray(atom14_mask), idx) * _A37_MASK[aatype]
        return atom37, mask37
    return atom37


def atom37_to_atom14(atom37, aatype, atom37_mask=None):
    """[..., L, 37, 3] -> [..., L, 14, 3] relayout by residue type."""
    atom37 = jnp.asarray(atom37)
    aatype = _align_aatype(aatype, atom37)
    idx = _A14_TO_A37[aatype]  # [..., L, 14]
    atom14 = _gather_atoms(atom37, idx)
    atom14 = atom14 * _A14_MASK[aatype][..., None]
    if atom37_mask is not None:
        mask14 = _gather_scalars(jnp.asarray(atom37_mask), idx) * _A14_MASK[aatype]
        return atom14, mask14
    return atom14


# ---------------------------------------------------------------------------
# backbone frames
# ---------------------------------------------------------------------------


def atom14_to_frames(atom14) -> Rigid:
    """Backbone frames from N/CA/C (atom14 slots 0/1/2): [..., L, 14, 3] ->
    Rigid with batch shape [..., L].

    Matches the reference construction: Gram-Schmidt on (C, CA, N) composed
    with the fixed axis flip diag(-1,1,-1) (reference `mdgen/geometry.py:218-231`).
    """
    atom14 = jnp.asarray(atom14)
    n, ca, c = atom14[..., 0, :], atom14[..., 1, :], atom14[..., 2, :]
    frames = Rigid.from_3_points(c, ca, n)
    flip = jnp.broadcast_to(_BB_FLIP, frames.rots.shape)
    return frames.compose(Rigid(flip, jnp.zeros_like(frames.trans)))


def prot_to_frames(ca_coords, c_coords, n_coords) -> Rigid:
    """Backbone frames from separate coordinate arrays (host-side PDB path)."""
    frames = Rigid.from_3_points(
        jnp.asarray(c_coords), jnp.asarray(ca_coords), jnp.asarray(n_coords)
    )
    flip = jnp.broadcast_to(_BB_FLIP, frames.rots.shape)
    return frames.compose(Rigid(flip, jnp.zeros_like(frames.trans)))


# ---------------------------------------------------------------------------
# torsions
# ---------------------------------------------------------------------------


def atom37_to_torsions(all_atom_positions, aatype, all_atom_mask=None):
    """Compute the 7 torsion angles per residue as (sin, cos) pairs.

    Args:
      all_atom_positions: [..., L, 37, 3]
      aatype: [..., L] int
      all_atom_mask: [..., L, 37] or None (defaults to the residue-type mask)

    Returns:
      (torsions [..., L, 7, 2], torsion_mask [..., L, 7])
    """
    pos = jnp.asarray(all_atom_positions)
    aatype = _align_aatype(aatype, pos)
    if all_atom_mask is None:
        mask = _A37_MASK[aatype]
    else:
        mask = jnp.asarray(all_atom_mask)

    # previous residue (shifted along the residue axis, zero padded at front)
    prev_pos = jnp.pad(
        pos[..., :-1, :, :],
        [(0, 0)] * (pos.ndim - 3) + [(1, 0), (0, 0), (0, 0)],
    )
    prev_mask = jnp.pad(
        mask[..., :-1, :], [(0, 0)] * (mask.ndim - 2) + [(1, 0), (0, 0)]
    )

    # quadruples defining omega/phi/psi
    pre_omega_atoms = jnp.concatenate(
        [prev_pos[..., 1:3, :], pos[..., :2, :]], axis=-2
    )
    phi_atoms = jnp.concatenate([prev_pos[..., 2:3, :], pos[..., :3, :]], axis=-2)
    psi_atoms = jnp.concatenate([pos[..., :3, :], pos[..., 4:5, :]], axis=-2)

    pre_omega_mask = jnp.prod(prev_mask[..., 1:3], axis=-1) * jnp.prod(
        mask[..., :2], axis=-1
    )
    phi_mask = prev_mask[..., 2] * jnp.prod(mask[..., :3], axis=-1)
    psi_mask = jnp.prod(mask[..., :3], axis=-1) * mask[..., 4]

    # chi quadruples via per-restype atom indices
    chi_idx = _CHI_IDX37[aatype]  # [..., L, 4, 4]
    flat_idx = chi_idx.reshape(*chi_idx.shape[:-2], 16)
    chi_atoms = _gather_atoms(pos, flat_idx).reshape(*chi_idx.shape, 3)
    chi_atom_mask = jnp.prod(
        _gather_scalars(mask, flat_idx).reshape(*chi_idx.shape), axis=-1
    )
    chi_mask = _CHI_MASK[aatype] * chi_atom_mask  # [..., L, 4]

    atoms = jnp.concatenate(
        [
            pre_omega_atoms[..., None, :, :],
            phi_atoms[..., None, :, :],
            psi_atoms[..., None, :, :],
            chi_atoms,
        ],
        axis=-3,
    )  # [..., L, 7, 4, 3]
    torsion_mask = jnp.concatenate(
        [
            pre_omega_mask[..., None],
            phi_mask[..., None],
            psi_mask[..., None],
            chi_mask,
        ],
        axis=-1,
    )  # [..., L, 7]

    torsion_frames = Rigid.from_3_points(
        atoms[..., 1, :], atoms[..., 2, :], atoms[..., 0, :], eps=1e-8
    )
    fourth_rel = torsion_frames.invert_apply(atoms[..., 3, :])
    sin_cos = jnp.stack([fourth_rel[..., 2], fourth_rel[..., 1]], axis=-1)
    sin_cos = sin_cos / jnp.sqrt(
        jnp.sum(sin_cos**2, axis=-1, keepdims=True) + 1e-8
    )
    sin_cos = sin_cos * _TORSION_SIGN[..., :, None]
    return sin_cos, torsion_mask


# ---------------------------------------------------------------------------
# reconstruction: frames + torsions -> all-atom coordinates
# ---------------------------------------------------------------------------


def torsion_angles_to_frames(r: Rigid, alpha, aatype) -> Rigid:
    """Build the 8 per-residue rigid-group frames in the global frame.

    Args:
      r: backbone frames, batch shape [..., L]
      alpha: [..., L, 7, 2] torsion (sin, cos)
      aatype: [..., L] int

    Returns: Rigid with batch shape [..., L, 8].
    """
    alpha = jnp.asarray(alpha)
    default_r = Rigid.from_tensor_4x4(_DEFAULT_FRAMES[aatype])  # [..., L, 8]

    # prepend the (sin=0, cos=1) identity rotation for the backbone group
    bb = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0], dtype=alpha.dtype), (*alpha.shape[:-2], 1, 2)
    )
    a = jnp.concatenate([bb, alpha], axis=-2)  # [..., L, 8, 2]
    sin, cos = a[..., 0], a[..., 1]
    zeros = jnp.zeros_like(sin)
    ones = jnp.ones_like(sin)
    # rotation about the local x axis by the torsion angle
    rot = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], axis=-1),
            jnp.stack([zeros, cos, -sin], axis=-1),
            jnp.stack([zeros, sin, cos], axis=-1),
        ],
        axis=-2,
    )
    all_frames = default_r.compose(Rigid(rot, jnp.zeros((*sin.shape, 3), sin.dtype)))

    # chain the chi frames: chi_{k} is defined relative to chi_{k-1}
    chi1 = all_frames[..., 4]
    chi2 = chi1.compose(all_frames[..., 5])
    chi3 = chi2.compose(all_frames[..., 6])
    chi4 = chi3.compose(all_frames[..., 7])

    to_bb = Rigid.cat(
        [
            all_frames[..., :5],
            chi2.expand_dims(-1),
            chi3.expand_dims(-1),
            chi4.expand_dims(-1),
        ],
        axis=-1,
    )
    return r.expand_dims(-1).compose(to_bb)


def frames_to_atom14(frames8: Rigid, aatype) -> jnp.ndarray:
    """Place idealized literature atom positions with the group frames.

    Args:
      frames8: per-group global frames, batch shape [..., L, 8]
      aatype: [..., L] int

    Returns: [..., L, 14, 3] atom positions (masked to existing atoms).
    """
    group_onehot = jnp.eye(8, dtype=frames8.rots.dtype)[_GROUP_IDX[aatype]]
    # select each atom's group frame via one-hot contraction; full precision
    # so the selection is exact (default matmul precision would round to bf16)
    rots = jnp.einsum(
        "...gij,...ag->...aij",
        frames8.rots,
        group_onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    trans = jnp.einsum(
        "...gi,...ag->...ai",
        frames8.trans,
        group_onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    atom_frames = Rigid(rots, trans)
    lit = _LIT_POSITIONS[aatype]  # [..., L, 14, 3]
    pred = atom_frames.apply(lit)
    return pred * _A14_MASK[aatype][..., None]


def frames_torsions_to_atom14(frames: Rigid, torsions, aatype) -> jnp.ndarray:
    """Composite reconstruction (reference `mdgen/geometry.py:61`)."""
    frames8 = torsion_angles_to_frames(frames, torsions, jnp.asarray(aatype))
    return frames_to_atom14(frames8, jnp.asarray(aatype))


def frames_torsions_to_atom37(frames: Rigid, torsions, aatype) -> jnp.ndarray:
    atom14 = frames_torsions_to_atom14(frames, torsions, aatype)
    return atom14_to_atom37(atom14, aatype)

"""Golden parity tests: our jnp tokenizer vs the reference torch implementation.

Skipped automatically when the read-only reference checkout is not present.
These tests assert numerical equivalence of the full tokenization /
reconstruction pipeline on random-but-valid protein geometry.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "mdgen")), reason="reference not available"
)

if os.path.isdir(os.path.join(REF, "mdgen")):
    sys.path.insert(0, REF)
    import torch
    from mdgen import geometry as ref_geo
    from mdgen.rigid_utils import Rigid as RefRigid, Rotation as RefRotation

import jax.numpy as jnp

from mdgen_tpu.geometry import (
    Rigid,
    atom14_to_atom37,
    atom14_to_frames,
    atom37_to_atom14,
    atom37_to_torsions,
    frames_torsions_to_atom14,
)
from mdgen_tpu.geometry import constants as rc


def synthetic_atom14(rng, T=3, L=6):
    """Random aatype + idealized atom14 coordinates perturbed and posed.

    Built from literature positions placed with random backbone frames, so
    N/CA/C geometry is realistic and torsions are well-defined.
    """
    aatype = rng.integers(0, 20, size=(L,))
    lit = rc.restype_atom14_rigid_group_positions[aatype]  # L, 14, 3
    out = np.zeros((T, L, 14, 3), dtype=np.float32)
    for t in range(T):
        for l in range(L):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            w, x, y, z = q
            R = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            trans = rng.normal(size=3) * 8.0 + np.array([l * 4.0, 0, 0])
            out[t, l] = (lit[l] @ R.T + trans) * rc.restype_atom14_mask[aatype][l][:, None]
    return out, aatype.astype(np.int32)


def test_atom14_atom37_roundtrip_matches_reference(rng):
    atom14, aatype = synthetic_atom14(rng)
    aatype_tl = np.broadcast_to(aatype, (atom14.shape[0], len(aatype)))

    ours37 = np.asarray(atom14_to_atom37(atom14, aatype_tl))
    ref37 = ref_geo.atom14_to_atom37(
        torch.from_numpy(atom14), torch.from_numpy(np.ascontiguousarray(aatype_tl))
    )
    np.testing.assert_allclose(ours37, np.asarray(ref37), atol=1e-5)

    ours14 = np.asarray(atom37_to_atom14(ours37, aatype_tl))
    ref14 = ref_geo.atom37_to_atom14(
        torch.from_numpy(np.asarray(ref37)), torch.from_numpy(np.ascontiguousarray(aatype_tl))
    )
    np.testing.assert_allclose(ours14, np.asarray(ref14), atol=1e-5)


def test_atom14_to_frames_matches_reference(rng):
    atom14, aatype = synthetic_atom14(rng)
    ours = atom14_to_frames(atom14)
    ref = ref_geo.atom14_to_frames(torch.from_numpy(atom14))
    np.testing.assert_allclose(
        np.asarray(ours.rots), ref.get_rots().get_rot_mats().numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(ours.trans), ref.get_trans().numpy(), atol=1e-4)


def test_atom37_to_torsions_matches_reference(rng):
    atom14, aatype = synthetic_atom14(rng)
    aatype_tl = np.ascontiguousarray(np.broadcast_to(aatype, (atom14.shape[0], len(aatype))))
    atom37 = np.asarray(atom14_to_atom37(atom14, aatype_tl))

    ours_t, ours_m = atom37_to_torsions(atom37, aatype_tl)
    ref_t, ref_m = ref_geo.atom37_to_torsions(
        torch.from_numpy(atom37).double(), torch.from_numpy(aatype_tl)
    )
    np.testing.assert_allclose(np.asarray(ours_m), ref_m.numpy(), atol=1e-5)
    # torsions at mask==0 positions are undefined garbage (phantom zero atoms)
    valid = np.asarray(ours_m)[..., None] > 0.5
    np.testing.assert_allclose(
        np.where(valid, np.asarray(ours_t), 0.0),
        np.where(valid, ref_t.numpy(), 0.0),
        atol=1e-3,
    )


def test_reconstruction_matches_reference(rng):
    atom14, aatype = synthetic_atom14(rng)
    T, L = atom14.shape[:2]
    aatype_tl = np.ascontiguousarray(np.broadcast_to(aatype, (T, L)))
    atom37 = np.asarray(atom14_to_atom37(atom14, aatype_tl))
    torsions, _ = atom37_to_torsions(atom37, aatype_tl)
    frames = atom14_to_frames(atom14)

    ours = np.asarray(
        frames_torsions_to_atom14(frames, jnp.asarray(torsions), aatype_tl)
    )

    ref_frames = RefRigid(
        RefRotation(rot_mats=torch.from_numpy(np.asarray(frames.rots))),
        torch.from_numpy(np.asarray(frames.trans)),
    )
    ref = ref_geo.frames_torsions_to_atom14(
        ref_frames,
        torch.from_numpy(np.asarray(torsions)),
        torch.from_numpy(aatype_tl),
    )
    np.testing.assert_allclose(ours, np.asarray(ref), atol=2e-3)


def test_full_roundtrip_reconstruction_error_small(rng):
    """Tokenize idealized geometry and rebuild it: backbone atoms must match
    closely (sidechain chi-independent atoms too, by construction)."""
    atom14, aatype = synthetic_atom14(rng)
    T, L = atom14.shape[:2]
    aatype_tl = np.ascontiguousarray(np.broadcast_to(aatype, (T, L)))
    atom37 = np.asarray(atom14_to_atom37(atom14, aatype_tl))
    torsions, _ = atom37_to_torsions(atom37, aatype_tl)
    frames = atom14_to_frames(atom14)
    rebuilt = np.asarray(frames_torsions_to_atom14(frames, torsions, aatype_tl))
    # N, CA, C are exactly the frame-defining atoms
    np.testing.assert_allclose(rebuilt[..., :3, :], atom14[..., :3, :], atol=2e-2)

"""PDB write/read round-trip + native writer parity."""
import numpy as np

from mdgen_tpu import native
from mdgen_tpu.data import synthetic_trajectory
from mdgen_tpu.geometry import constants as rc
from mdgen_tpu.protein import atom14_to_pdb, load_pdb_trajectory


def test_pdb_roundtrip(tmp_path, rng):
    traj = synthetic_trajectory("ACDEFGHI", 4, seed=3).astype(np.float32)
    aatype = rc.str_sequence_to_aatype("ACDEFGHI")
    path = str(tmp_path / "traj.pdb")
    atom14_to_pdb(traj, aatype, path)
    arr, aa = load_pdb_trajectory(path)
    assert arr.shape == traj.shape
    np.testing.assert_array_equal(aa, aatype)
    # PDB has 3 decimal places
    np.testing.assert_allclose(arr, traj, atol=6e-4)


def test_native_writer_matches_python(tmp_path):
    traj = synthetic_trajectory("WYNK", 3, seed=5).astype(np.float32)
    aatype = rc.str_sequence_to_aatype("WYNK")

    p_native = str(tmp_path / "n.pdb")
    p_python = str(tmp_path / "p.pdb")
    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    atom14_to_pdb(traj, aatype, p_native)

    # force the Python fallback
    saved = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        atom14_to_pdb(traj, aatype, p_python)
    finally:
        native._lib, native._tried = saved

    assert open(p_native).read() == open(p_python).read()


def test_save_load_trajectory_atom_zero_at_later_frames(tmp_path):
    """Writer and reader derive the XTC atom selection from frame 0 ONLY, so
    an atom that is zero at frame 0 but present later cannot desync them
    (ADVICE round 2: .any(0) writer mask vs frame-0 reader mask)."""
    from mdgen_tpu.data import synthetic_trajectory
    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.protein import load_trajectory, save_trajectory

    seq = "ACDE"
    aatype = np.asarray(rc.str_sequence_to_aatype(seq))
    traj = synthetic_trajectory(seq, 5, seed=0).astype(np.float32)
    # atom zero at frame 0, nonzero later (the desync trigger)
    traj[0, 2, 5] = 0.0
    traj[1:, 2, 5] = 1.0

    pdb = str(tmp_path / "t.pdb")
    save_trajectory(traj, aatype, pdb, xtc_path=str(tmp_path / "t.xtc"))
    out, aat = load_trajectory(pdb)  # must not raise a shape mismatch
    assert out.shape[0] == 5
    np.testing.assert_array_equal(aat, aatype)
    # the frame-0-zero atom is consistently dropped everywhere
    assert np.abs(out[:, 2, 5]).sum() == 0.0

"""XTC writer/reader + Kabsch superposition tests.

The C++ and Python encoders implement the same published xdrfile
``xdr3dfcoord`` algorithm independently; byte-identical output is the
cross-check (no mdtraj in this image to read the files externally).
"""
import numpy as np
import pytest

from mdgen_tpu import native, xtc


def _protein_like(rng, T, N, spread=1.5, jitter=0.05):
    base = rng.normal(size=(N, 3)) * spread
    return (base[None] + rng.normal(size=(T, N, 3)) * jitter).astype(np.float32)


def test_round_trip_python_encoder(tmp_path, rng):
    coords = _protein_like(rng, 4, 61)
    p = str(tmp_path / "t.xtc")
    xtc.write_xtc(p, coords, use_native=False)
    dec, steps, times = xtc.read_xtc(p)
    assert dec.shape == coords.shape
    np.testing.assert_array_equal(steps, np.arange(4))
    # 1/precision quantization: max error 0.5/1000 nm
    assert np.abs(dec - coords).max() <= 0.5 / 1000 + 1e-6


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_and_python_encoders_bit_identical(tmp_path, rng):
    for seed, (T, N) in enumerate([(3, 58), (2, 500), (5, 14)]):
        r = np.random.default_rng(seed)
        coords = _protein_like(r, T, N, jitter=0.2 if seed else 0.02)
        pa, pb = str(tmp_path / f"a{seed}.xtc"), str(tmp_path / f"b{seed}.xtc")
        assert xtc.write_xtc(pa, coords, use_native=True) is None
        xtc.write_xtc(pb, coords, use_native=False)
        assert open(pa, "rb").read() == open(pb, "rb").read()
        dec, _, _ = xtc.read_xtc(pa)
        assert np.abs(dec - coords).max() <= 0.5 / 1000 + 1e-6


def test_small_system_plain_floats(tmp_path, rng):
    """natoms <= 9 uses the uncompressed float path of the format."""
    coords = _protein_like(rng, 3, 7)
    p = str(tmp_path / "s.xtc")
    xtc.write_xtc(p, coords)
    dec, _, _ = xtc.read_xtc(p)
    np.testing.assert_array_equal(dec, coords)


def test_spread_out_coordinates_round_trip(tmp_path, rng):
    """Large bounding box with far-apart atoms exercises the non-run path
    and per-dimension bit sizes."""
    coords = (rng.normal(size=(2, 40, 3)) * 50).astype(np.float32)
    p = str(tmp_path / "w.xtc")
    xtc.write_xtc(p, coords, use_native=False)
    dec, _, _ = xtc.read_xtc(p)
    assert np.abs(dec - coords).max() <= 0.5 / 1000 + 1e-5


def test_steps_and_times(tmp_path, rng):
    coords = _protein_like(rng, 3, 20)
    p = str(tmp_path / "t.xtc")
    xtc.write_xtc(p, coords, steps=[5, 10, 15], times=[0.5, 1.0, 1.5])
    _, steps, times = xtc.read_xtc(p)
    np.testing.assert_array_equal(steps, [5, 10, 15])
    np.testing.assert_allclose(times, [0.5, 1.0, 1.5])


def test_superpose_undoes_rigid_motion(rng):
    from scipy.spatial.transform import Rotation as R

    base = rng.normal(size=(30, 3)).astype(np.float64)
    rot = R.random(random_state=3).as_matrix()
    moved = np.stack([base, base @ rot.T + np.array([1.0, -2.0, 0.5])])
    aligned = xtc.superpose(moved)
    np.testing.assert_allclose(aligned[1], aligned[0], atol=1e-5)
    # frame 0 is untouched
    np.testing.assert_allclose(aligned[0], base, atol=1e-6)


def test_superpose_mask_limits_fit(rng):
    """Only fit atoms drive the alignment; all atoms are transformed."""
    from scipy.spatial.transform import Rotation as R

    base = rng.normal(size=(20, 3))
    rot = R.random(random_state=4).as_matrix()
    frame1 = base @ rot.T + 3.0
    frame1[10:] += rng.normal(size=(10, 3)) * 5  # junk outside the fit mask
    mask = np.zeros(20)
    mask[:10] = 1
    aligned = xtc.superpose(np.stack([base, frame1]), mask)
    np.testing.assert_allclose(aligned[1][:10], base[:10], atol=1e-5)


def test_save_trajectory_pdb_xtc_pair(tmp_path, rng):
    """save_trajectory with xtc_path writes a frame-0 PDB + superposed XTC
    whose atom counts match (the mdtraj topology+trajectory contract)."""
    from mdgen_tpu.data import synthetic_trajectory
    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.protein import load_pdb_trajectory, save_trajectory

    seq = "ACDE"
    atom14 = synthetic_trajectory(seq, 6, seed=0)
    aatype = np.asarray(rc.str_sequence_to_aatype(seq))
    pdb = str(tmp_path / "x.pdb")
    xtc_path = str(tmp_path / "x.xtc")
    save_trajectory(atom14, aatype, pdb, xtc_path=xtc_path)

    pdb_traj, _ = load_pdb_trajectory(pdb)
    assert pdb_traj.shape[0] == 1  # frame 0 only
    coords, _, _ = xtc.read_xtc(xtc_path)
    n_valid = int(rc.RESTYPE_ATOM14_MASK[aatype].sum())
    assert coords.shape == (6, n_valid, 3)
    # XTC frame 0 equals the PDB's atoms in atom37 order. Tolerance: the
    # XTC grid is 1e-3 nm = 1e-2 A (max error 5e-3 A), the PDB has 1e-3 A
    # decimals (max error 5e-4 A)
    from mdgen_tpu.geometry import atom14_to_atom37

    pdb37 = np.asarray(atom14_to_atom37(pdb_traj, aatype))
    mask37 = rc.RESTYPE_ATOM37_MASK[aatype].astype(bool)
    np.testing.assert_allclose(coords[0] * 10.0, pdb37[0][mask37], atol=6e-3)


def test_load_trajectory_reads_sibling_xtc(tmp_path):
    """load_trajectory must return the FULL trajectory when the PDB is a
    frame-0 topology with a sibling XTC (the save_trajectory --xtc layout),
    and fall back to the multi-MODEL PDB otherwise. Regression: the analysis
    scripts previously read only the 1-frame topology PDB."""
    from mdgen_tpu.data import synthetic_trajectory
    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.protein import load_trajectory, save_trajectory
    from mdgen_tpu.xtc import superpose

    seq = "WYNK"
    T = 5
    atom14 = synthetic_trajectory(seq, T, seed=1)
    aatype = np.asarray(rc.str_sequence_to_aatype(seq))

    # xtc layout
    pdb = str(tmp_path / "t.pdb")
    save_trajectory(atom14, aatype, pdb, xtc_path=str(tmp_path / "t.xtc"))
    got, aa = load_trajectory(pdb)
    assert got.shape == (T, len(seq), 14, 3)
    np.testing.assert_array_equal(aa, aatype)
    mask14 = rc.RESTYPE_ATOM14_MASK[aatype].astype(bool)
    aligned = superpose(
        atom14.reshape(T, -1, 3), mask14.reshape(-1)
    ).reshape(atom14.shape)
    # grid: XTC 5e-3 A + PDB 5e-4 A on the frame-0 topology
    np.testing.assert_allclose(got[:, mask14], aligned[:, mask14], atol=1e-2)

    # multi-MODEL layout (no xtc)
    pdb2 = str(tmp_path / "m.pdb")
    save_trajectory(atom14, aatype, pdb2)
    got2, _ = load_trajectory(pdb2)
    assert got2.shape == (T, len(seq), 14, 3)
    np.testing.assert_allclose(got2[:, mask14], atom14[:, mask14], atol=1e-3)

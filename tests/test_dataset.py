"""Dataset contract tests: windows, overfit flags, ATLAS crop/pad."""
import numpy as np
import pytest

from mdgen_tpu.config import MDGenConfig
from mdgen_tpu.data import MDGenDataset, write_synthetic_dataset


@pytest.fixture
def data_dir(tmp_path):
    import os
    import shutil

    d = str(tmp_path / "data")
    write_synthetic_dataset(
        d, [("ACDE", "ACDE"), ("WYNK", "WYNK")], num_frames=120, seed=0
    )
    shutil.copy(f"{d}/split.csv", f"{d}/main_split.csv")
    # ATLAS-style replicas for a longer peptide (overwrites split.csv)
    write_synthetic_dataset(
        d,
        [(f"pep1_R{i}", "ACDEFGHIKL") for i in (1, 2, 3)],
        num_frames=120,
        seed=5,
    )
    os.replace(f"{d}/main_split.csv", f"{d}/split.csv")
    with open(f"{d}/atlas_split.csv", "w") as fh:
        fh.write("name,seqres\npep1,ACDEFGHIKL\n")
    return d


def test_window_sampling_and_contract(data_dir):
    cfg = MDGenConfig(num_frames=16, crop=4, sim_condition=True)
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv", data_dir)
    assert len(ds) == 2
    item = ds[0]
    assert item["atom14"].shape == (16, 4, 14, 3)
    assert item["atom14"].dtype == np.float32
    assert item["seqres"].shape == (4,)
    assert item["mask"].sum() == 4


def test_window_exact_length(tmp_path):
    """A trajectory with exactly num_frames frames is a valid window
    (start 0); reference `mdgen/dataset.py:40` crashes on this edge."""
    from mdgen_tpu.data import write_synthetic_dataset

    d = str(tmp_path / "exact")
    write_synthetic_dataset(d, [("ACDE", "ACDE")], num_frames=16, seed=2)
    cfg = MDGenConfig(num_frames=16, crop=4)
    ds = MDGenDataset(cfg, f"{d}/split.csv", d)
    item = ds[0]
    assert item["frame_start"] == 0
    assert item["atom14"].shape == (16, 4, 14, 3)


def test_overfit_flags(data_dir):
    cfg = MDGenConfig(num_frames=16, crop=4, overfit=True, overfit_frame=True,
                      copy_frames=True)
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv", data_dir)
    a = ds[0]
    b = ds[1]  # overfit: every index maps to item 0
    assert a["name"] == b["name"] == "ACDE"
    np.testing.assert_array_equal(a["atom14"], b["atom14"])  # fixed window
    # copy_frames: every frame equals frame 0
    np.testing.assert_array_equal(a["atom14"][1:], np.broadcast_to(
        a["atom14"][0], a["atom14"][1:].shape))


def test_overfit_peptide(data_dir):
    cfg = MDGenConfig(num_frames=16, crop=4, overfit_peptide="WYNK")
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv", data_dir)
    assert len(ds) == 1000
    assert ds[123]["name"] == "WYNK"


def test_atlas_pad(data_dir):
    # L=10 < crop=16: identity-pad with zero mask; +1 left-context column
    # (mask 0: the chain starts at the window)
    cfg = MDGenConfig(num_frames=8, crop=16, atlas=True)
    ds = MDGenDataset(cfg, f"{data_dir}/atlas_split.csv", data_dir)
    item = ds[0]
    assert item["name"].startswith("pep1_R")
    assert item["atom14"].shape == (8, 17, 14, 3)
    assert item["mask"][0] == 0 and (item["atom14"][:, 0] == 0).all()
    assert item["mask"][1:11].all() and not item["mask"][11:].any()
    assert (item["seqres"][11:] == 0).all()


def test_atlas_crop(data_dir):
    # L=10 > crop=6: random contiguous crop + 1 left-context column whose
    # mask says whether a real previous residue exists
    cfg = MDGenConfig(num_frames=8, crop=6, atlas=True)
    ds = MDGenDataset(cfg, f"{data_dir}/atlas_split.csv", data_dir)
    seen_ctx = set()
    for i in range(20):
        item = ds[0]
        assert item["atom14"].shape == (8, 7, 14, 3)
        assert item["mask"][1:].sum() == 6
        ctx_real = bool(item["mask"][0])
        seen_ctx.add(ctx_real)
        if ctx_real:
            assert (item["atom14"][:, 0] != 0).any()
        else:  # crop started at the chain start
            assert (item["atom14"][:, 0] == 0).all()
    assert seen_ctx == {True, False}  # both cases sampled over 20 draws


def test_atlas_context_preserves_first_residue_phi(data_dir):
    """The left-context column restores phi/omega supervision for the first
    cropped residue: tokenizing the context-carrying window must match
    tokenizing the full chain then cropping (the reference's order,
    `mdgen/dataset.py:50-89`)."""
    import jax.numpy as jnp

    from mdgen_tpu.geometry import atom14_to_atom37, atom37_to_torsions
    from mdgen_tpu.runtime import tokenize_atom14

    cfg = MDGenConfig(num_frames=4, crop=6, atlas=True)
    ds = MDGenDataset(cfg, f"{data_dir}/atlas_split.csv", data_dir)
    # find a crop with real context
    for _ in range(50):
        item = ds[0]
        if item["mask"][0] == 1:
            break
    assert item["mask"][0] == 1

    batch = {
        "atom14": jnp.asarray(item["atom14"][None]),
        "seqres": jnp.asarray(item["seqres"][None]),
        "mask": jnp.asarray(item["mask"][None]),
    }
    tok = tokenize_atom14(batch, drop_left_context=True)
    assert tok["torsions"].shape[2] == 6
    # first cropped residue keeps phi (index 1) + omega (index 0) supervision
    assert tok["torsion_mask"][0, 0, 0] == 1  # omega
    assert tok["torsion_mask"][0, 0, 1] == 1  # phi

    # and the values match full-chain tokenization
    full = np.asarray(
        np.lib.format.open_memmap(f"{data_dir}/{item['name']}.npy", "r"),
        np.float32,
    )[item["frame_start"] : item["frame_start"] + 4]
    from mdgen_tpu.geometry import constants as rc

    aatype = rc.str_sequence_to_aatype("ACDEFGHIKL")
    aatype_tl = np.broadcast_to(aatype, (4, 10))
    atom37 = atom14_to_atom37(jnp.asarray(full), jnp.asarray(aatype_tl))
    tors_full, mask_full = atom37_to_torsions(atom37, jnp.asarray(aatype_tl))
    # locate the crop within the chain via sequence match
    seq_crop = np.asarray(item["seqres"][1:])
    for s in range(10 - 6 + 1):
        if (aatype[s : s + 6] == seq_crop).all():
            break
    np.testing.assert_allclose(
        np.asarray(tok["torsions"][0]),
        np.asarray(tors_full[:, s : s + 6]),
        atol=1e-4,
    )


def test_frame_interval(data_dir):
    cfg = MDGenConfig(num_frames=16, crop=4, frame_interval=4, overfit_frame=True)
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv", data_dir)
    strided = ds[0]["atom14"]
    cfg2 = MDGenConfig(num_frames=61, crop=4, overfit_frame=True)
    full = MDGenDataset(cfg2, f"{data_dir}/split.csv", data_dir)[0]["atom14"]
    np.testing.assert_array_equal(strided, full[::4])


def test_synthetic_rotamer_trajectory_has_thermal_multimodal_chis():
    """The rotamer generator (round-3 quality lever) must produce sidechain
    torsions with thermal width and basin structure — not the delta-function
    marginals of the rigid v1 generator — and they must round-trip through
    the tokenizer (the atoms are reconstructed from the sampled torsions)."""
    import jax.numpy as jnp

    from mdgen_tpu.data import synthetic_rotamer_trajectory
    from mdgen_tpu.geometry import atom14_to_atom37, atom37_to_torsions
    from mdgen_tpu.geometry import constants as rc

    T = 256
    seq = "WYNK"
    aatype = np.asarray(rc.str_sequence_to_aatype(seq))
    traj = synthetic_rotamer_trajectory(seq, T, seed=7)
    assert traj.shape == (T, 4, 14, 3) and traj.dtype == np.float16
    assert np.isfinite(traj.astype(np.float32)).all()

    aat = jnp.broadcast_to(jnp.asarray(aatype)[None, None], (1, T, 4))
    a37 = atom14_to_atom37(jnp.asarray(traj[None].astype(np.float32)), aat)
    tors, tmask = atom37_to_torsions(a37, aat)
    ang = np.arctan2(np.asarray(tors)[0, ..., 0], np.asarray(tors)[0, ..., 1])
    tmask = np.asarray(tmask)[0, 0]  # [L, 7] (mask is constant over T)

    # every valid chi torsion has thermal width (no delta-bin pathology):
    # its circular std must exceed the histogram bin width (2pi/100)
    for li in range(4):
        for ti in range(3, 7):
            if not tmask[li, ti]:
                continue
            a = ang[:, li, ti]
            R = np.abs(np.mean(np.exp(1j * a)))
            circ_std = np.sqrt(-2 * np.log(max(R, 1e-12)))
            assert circ_std > 2 * np.pi / 100, (li, ti, circ_std)


def test_rotamer_path_seed_resamples_same_system():
    """path_seed mode (noise-floor contract): same `seed` = same physical
    system (basin occupancies), different `path_seed` = independent
    trajectory; path_seed=None keeps the original single-stream draw order
    (regression: the floor must never be measured across systems)."""
    import jax.numpy as jnp

    from mdgen_tpu.data import synthetic_rotamer_trajectory
    from mdgen_tpu.geometry import atom14_to_atom37, atom37_to_torsions
    from mdgen_tpu.geometry import constants as rc

    T = 600
    seq = "DKYA"
    # default mode is deterministic (byte-stable across calls)
    a0 = synthetic_rotamer_trajectory(seq, 64, seed=3)
    a1 = synthetic_rotamer_trajectory(seq, 64, seed=3)
    assert np.array_equal(a0, a1)

    def chi1_occupancy(traj):
        aat = jnp.broadcast_to(
            jnp.asarray(rc.str_sequence_to_aatype(seq))[None, None], (1, T, 4)
        )
        a37 = atom14_to_atom37(jnp.asarray(traj[None].astype(np.float32)), aat)
        tors, _ = atom37_to_torsions(a37, aat)
        ang = np.arctan2(
            np.asarray(tors)[0, :, 0, 3, 0], np.asarray(tors)[0, :, 0, 3, 1]
        )  # ASP chi1
        basins = np.deg2rad([-60.0, 60.0, 180.0])
        d = np.abs(np.angle(np.exp(1j * (ang[:, None] - basins[None]))))
        counts = np.bincount(d.argmin(1), minlength=3)
        return counts / counts.sum()

    b1 = synthetic_rotamer_trajectory(seq, T, seed=3, path_seed=11)
    b2 = synthetic_rotamer_trajectory(seq, T, seed=3, path_seed=12)
    c = synthetic_rotamer_trajectory(seq, T, seed=40, path_seed=11)
    # independent paths differ frame-wise...
    assert not np.array_equal(b1, b2)
    # ...but visit the same basins with similar occupancy (same system),
    # while a different system seed gives a different occupancy profile
    o1, o2, oc = chi1_occupancy(b1), chi1_occupancy(b2), chi1_occupancy(c)
    assert np.abs(o1 - o2).max() < np.abs(o1 - oc).max()


def test_rotamer_replay_matches_default_mode_system():
    """replay_frames recovers the EXACT distribution params of a
    default-mode dataset (the eval-set / noise-floor contract: resampling
    the system an existing trained model's data came from)."""
    from mdgen_tpu.data import synthetic_rotamer_trajectory

    d_def, d_rep = {}, {}
    synthetic_rotamer_trajectory("WYNK", 700, seed=1, _dist_out=d_def)
    synthetic_rotamer_trajectory(
        "WYNK", 300, seed=1, path_seed=9, replay_frames=700, _dist_out=d_rep
    )
    assert set(d_def) == set(d_rep)
    for k in d_def:
        assert np.allclose(d_def[k][0], d_rep[k][0])
        assert d_def[k][1] == d_rep[k][1]

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
    assert item["atom14"].dtype == np.float16
    assert item["seqres"].shape == (4,)
    assert item["mask"].sum() == 4


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
    # L=10 < crop=16: identity-pad with zero mask
    cfg = MDGenConfig(num_frames=8, crop=16, atlas=True)
    ds = MDGenDataset(cfg, f"{data_dir}/atlas_split.csv", data_dir)
    item = ds[0]
    assert item["name"].startswith("pep1_R")
    assert item["atom14"].shape == (8, 16, 14, 3)
    assert item["mask"][:10].all() and not item["mask"][10:].any()
    assert (item["seqres"][10:] == 0).all()


def test_atlas_crop(data_dir):
    # L=10 > crop=6: random contiguous crop
    cfg = MDGenConfig(num_frames=8, crop=6, atlas=True)
    ds = MDGenDataset(cfg, f"{data_dir}/atlas_split.csv", data_dir)
    item = ds[0]
    assert item["atom14"].shape == (8, 6, 14, 3)
    assert item["mask"].sum() == 6


def test_frame_interval(data_dir):
    cfg = MDGenConfig(num_frames=16, crop=4, frame_interval=4, overfit_frame=True)
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv", data_dir)
    strided = ds[0]["atom14"]
    cfg2 = MDGenConfig(num_frames=61, crop=4, overfit_frame=True)
    full = MDGenDataset(cfg2, f"{data_dir}/split.csv", data_dir)[0]["atom14"]
    np.testing.assert_array_equal(strided, full[::4])

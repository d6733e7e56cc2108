"""Analysis plot generation (reference figure parity, matplotlib-only).

Drives the actual `make_plot` functions of scripts/analyze_peptide_tps.py
and scripts/analyze_upsampling.py (loaded from source with a patched argv)
on small real inputs and asserts the PDFs appear."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script_ns(script, argv):
    path = os.path.join(REPO, "scripts", script)
    src = open(path).read()
    # everything above the name-listing / driver block defines the functions
    head = src.split("if args.pdb_id:")[0].split("\nif args.pdb_id")[0]
    ns = {"__file__": path}
    old = sys.argv
    sys.argv = argv
    try:
        exec(compile(head, script, "exec"), ns)
    finally:
        sys.argv = old
    return ns


def test_tps_plot(tmp_path):
    from mdgen_tpu.analysis import featurize_torsions
    from mdgen_tpu.analysis.msm import get_state_probs
    from mdgen_tpu.analysis.reference_msm import (
        build_reference_msm,
        lowest_flux_states,
    )
    from mdgen_tpu.data import synthetic_rotamer_trajectory
    from mdgen_tpu.geometry import constants as rc

    name, seq = "ACDE", "ACDE"
    arr = synthetic_rotamer_trajectory(seq, 800, seed=0).astype(np.float32)
    mddir = tmp_path / "md"
    mddir.mkdir()
    np.save(mddir / f"{name}.npy", arr)
    aat = np.asarray(rc.str_sequence_to_aatype(seq))
    meta = build_reference_msm(
        arr, aat, tica_lag=50, msm_lag=10, kmeans_k=20, n_metastable=4
    )
    start, end = lowest_flux_states(meta["cmsm"])

    gen_ys, paths = [], []
    for s in range(0, 300, 100):
        feats = featurize_torsions(
            arr[s : s + 100], aat, sidechains=True, cossin=True
        )
        y = meta["tica"].transform(feats)
        gen_ys.append(y)
        paths.append(
            meta["msm"].metastable_assignments[meta["kmeans"].transform(y)]
        )
    paths = np.stack(paths)
    gen_tp = np.concatenate([paths[:, ::10], paths[:, -1:]], 1)

    ns = _load_script_ns(
        "analyze_peptide_tps.py",
        ["x", "--mddir", str(mddir), "--pdbdir", str(tmp_path), "--plot"],
    )
    ns["_AATYPE_CACHE"][name] = aat
    sp = get_state_probs(gen_tp)
    ns["make_plot"](name, meta, gen_ys, gen_tp, start, end, sp, sp)
    assert (tmp_path / f"{name}_tps.pdf").stat().st_size > 0


def test_upsampling_plot(tmp_path):
    ns = _load_script_ns(
        "analyze_upsampling.py",
        ["x", "--mddir", "/nonexistent", "--pdbdir", str(tmp_path),
         "--cond_interval", "10", "--plot"],
    )
    out = {"backbone": {}, "sidechain": {}}
    for sec in out:
        for i in range(2):
            out[sec][f"res{i}_tor3"] = {
                "truth": np.exp(-np.arange(60) / 30).astype(np.float16),
                "gen": np.exp(-np.arange(60) / 25).astype(np.float16),
                "naive": np.exp(-np.arange(6) / 3).astype(np.float16),
            }
    ns["make_plot"]("TEST", out)
    assert (tmp_path / "TEST_decorr.pdf").stat().st_size > 0

"""Tests for the repo-level result-persistence helper (scripts/persist_results.py).

The helper guards the round-to-round audit trail (BENCH.md claims must point
at committed artifacts), so its selection rules (analysis extensions only,
per-file size cap, provenance summary) get unit-tested without any jax
involvement. The script resolves its results/ root from its own location,
so the test runs a copy placed under a sandbox scripts/ dir.
"""
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_persist_selects_analysis_artifacts_and_caps_size(tmp_path):
    src = tmp_path / "samples"
    src.mkdir()
    (src / "metrics.json").write_text('{"a": 1}')
    (src / "table.csv").write_text("a,b\n1,2\n")
    (src / "notes.txt").write_text("hello")
    (src / "traj.npy").write_bytes(b"\x00" * 128)        # bulk data: excluded
    (src / "frames.pdb").write_text("ATOM\n")            # bulk data: excluded
    (src / "big.pkl").write_bytes(b"\x00" * (5 * 1024 * 1024 + 1))  # oversize
    (src / "subdir").mkdir()                              # dirs: ignored

    # sandbox copy: REPO is derived from the script path, so results/ lands
    # under tmp_path instead of the real repo
    (tmp_path / "scripts").mkdir()
    script = tmp_path / "scripts" / "persist_results.py"
    shutil.copy(os.path.join(REPO, "scripts", "persist_results.py"), script)
    subprocess.run(
        [sys.executable, str(script), "--round", "99", "--task", "smoketest",
         "--src", str(src), "--note", "n", "--cmd", "c"],
        capture_output=True, text=True, check=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )

    dst = tmp_path / "results" / "r99_smoketest"
    assert dst.is_dir()
    copied = sorted(os.listdir(dst))
    assert {"metrics.json", "table.csv", "notes.txt"} <= set(copied)
    assert "traj.npy" not in copied
    assert "frames.pdb" not in copied
    assert "big.pkl" not in copied

    summary = json.loads((dst / "summary.json").read_text())
    assert summary["round"] == 99
    assert summary["task"] == "smoketest"
    assert summary["note"] == "n"
    assert summary["command"] == "c"
    assert summary["skipped_oversize"] == ["big.pkl"]
    assert set(summary["files"]) == {"metrics.json", "table.csv", "notes.txt"}


def test_eval_protocol_summarize_grouping(tmp_path):
    """summarize() drives the model-vs-floor tables in BENCH.md: torsion keys
    group by first token, joint keys ("|") group as RAMA, and the headline
    mean-torsion JSD excludes RAMA and TICA entries."""
    import pickle

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from eval_protocol import summarize

    out = {
        "ACDE": {"JSD": {
            "PHI 1": 0.10, "PSI 1": 0.20, "CHI1 1": 0.30,
            "PHI 1|PSI 1": 0.50, "TICA-0": 0.40,
        }},
        "WYNK": {"JSD": {"PHI 1": 0.30}},
    }
    pkl = tmp_path / "out.pkl"
    with open(pkl, "wb") as fh:
        pickle.dump(out, fh)

    per_type, mean_tors = summarize(str(pkl))
    assert per_type["PHI"] == 0.20          # mean of 0.10 and 0.30
    assert per_type["PSI"] == 0.20
    assert per_type["CHI1"] == 0.30
    assert per_type["RAMA"] == 0.50         # "|" keys -> joint Ramachandran
    assert per_type["TICA-0"] == 0.40
    # torsion headline: PHI (x2), PSI, CHI1 only — no RAMA, no TICA
    assert abs(mean_tors - (0.10 + 0.30 + 0.20 + 0.30) / 4) < 1e-12

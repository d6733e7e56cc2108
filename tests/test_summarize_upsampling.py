"""summarize_upsampling: hand-built acf pickle -> known group means."""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from summarize_upsampling import summarize  # noqa: E402


def test_summarize_groups_and_errors(tmp_path):
    lag = 4
    # live torsion: truth lag-1 acf 0.9 (> 0.5), |gen-truth| = 0.1 each lag
    truth_live = np.array([1.0, 0.9, 0.8, 0.7, 0.6], np.float16)
    gen_live = truth_live - np.float16(0.1)
    # sub-Nyquist: truth lag-1 acf 0.2 (<= 0.5), |gen-truth| = 0.3 each lag
    truth_fast = np.array([1.0, 0.2, 0.1, 0.05, 0.0], np.float16)
    gen_fast = truth_fast + np.float16(0.3)
    results = {
        "ACDE": {
            "backbone": {
                "res0_tor1": {"truth": truth_live, "gen": gen_live,
                              "naive": truth_live[:1]},
            },
            "sidechain": {
                "res1_tor4": {"truth": truth_fast, "gen": gen_fast,
                              "naive": truth_fast[:1]},
            },
        }
    }
    pkl = tmp_path / "upsampling_out.pkl"
    with open(pkl, "wb") as fh:
        pickle.dump(results, fh)

    out = summarize(str(pkl), max_lag=lag)
    assert out["live_n"] == 1 and out["sub_nyquist_n"] == 1
    np.testing.assert_allclose(out["live_mean_acf_err"], 0.1, atol=1e-3)
    np.testing.assert_allclose(out["sub_nyquist_mean_acf_err"], 0.3, atol=1e-3)
    assert out["per_peptide"]["ACDE"]["live"] is not None

    # gen shorter than truth (different nlag caps): uses the common prefix
    results["ACDE"]["backbone"]["res0_tor1"]["gen"] = gen_live[:3]
    with open(pkl, "wb") as fh:
        pickle.dump(results, fh)
    out2 = summarize(str(pkl), max_lag=lag)
    np.testing.assert_allclose(out2["live_mean_acf_err"], 0.1, atol=1e-3)

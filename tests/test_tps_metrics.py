"""Reference-contract TPS metrics on a hand-built MSM.

VERDICT round 2 #2: the round-1/2 script scored full-length paths against an
identity-padded 10x10 matrix, defined "valid" as endpoint match, and reported
mean log likelihood — none of which is the reference's definition. These
tests pin the reference contract (`/root/reference/scripts/
analyze_peptide_tps.py:63-131`) on a small MSM where every quantity can be
computed independently, including the active-set fallback quirk.
"""
import numpy as np
import pytest

from mdgen_tpu.analysis import (
    MarkovStateModel,
    get_state_probs,
    map_to_active,
    reference_replica_metrics,
    reference_tps_metrics,
    sample_tp,
)
from mdgen_tpu.analysis.metrics import jensen_shannon


def toy_cmsm():
    """3-active-state cMSM over metastable labels {0, 1, 3}; label 2 is
    outside the active set (the fallback case)."""
    T = np.array(
        [
            [0.8, 0.15, 0.05],
            [0.1, 0.8, 0.1],
            [0.05, 0.15, 0.8],
        ]
    )
    # stationary dist of T (left eigenvector)
    ev, V = np.linalg.eig(T.T)
    pi = np.real(V[:, np.argmin(np.abs(ev - 1))])
    pi = np.abs(pi) / np.abs(pi).sum()
    return MarkovStateModel(
        transition_matrix=T,
        active_set=np.array([0, 1, 3]),
        lag=1,
        pi=pi,
        n_full_states=4,
    )


def ref_bridge_probs(tp, trans):
    """Straight transcription of the reference likelihood formula
    (reference `mdgen/analysis.py:79-95`), used as the independent oracle."""
    N = tp.shape[1]
    s_N = tp[0, -1]
    out = []
    for i in range(N - 1):
        t = i + 1
        s_t = tp[:, i]
        numerator = np.linalg.matrix_power(trans, N - t - 1)[:, s_N] * trans[s_t, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            probs = numerator / np.linalg.matrix_power(trans, N - t)[s_t, s_N][:, None]
        out.append(probs[np.arange(len(tp)), tp[:, i + 1]])
    probs = np.stack(out, axis=1)
    probs[np.isnan(probs)] = 0
    return probs


def test_map_to_active_fallback_quirk():
    cmsm = toy_cmsm()
    # highest-pi active state by LABEL (the reference quirk: the label, not
    # the active index, is the fallback value)
    hp_label = int(cmsm.active_set[np.argmax(cmsm.pi)])
    tp = np.array([[0, 1, 3, 2]])
    mapped = map_to_active(tp, cmsm)
    np.testing.assert_array_equal(mapped[0, :3], [0, 1, 2])  # active indices
    assert mapped[0, 3] == hp_label


def test_reference_tps_metrics_definitions():
    cmsm = toy_cmsm()
    rng = np.random.default_rng(0)
    # full-length paths over LABELS, T=30 -> subsample ::10 + last = 4 states
    paths = np.array(
        [
            [0] * 10 + [1] * 10 + [3] * 10,
            [0] * 10 + [2] * 10 + [3] * 10,  # visits the inactive label
            [1] * 30,                         # wrong endpoints
        ]
    )
    out, ref_stateprobs, gen_tp = reference_tps_metrics(
        paths, cmsm, start_state=0, end_state=3, n_bridge_samples=500, rng=rng
    )
    # subsampling contract: [:, ::10] + last frame
    np.testing.assert_array_equal(
        gen_tp, np.c_[paths[:, ::10], paths[:, -1]]
    )
    # oracle: reference formula end to end
    mapped = map_to_active(gen_tp, cmsm)
    probs = ref_bridge_probs(mapped, cmsm.transition_matrix)
    gen_prob = probs.prod(-1)
    assert out["gen_prob"] == pytest.approx(gen_prob.mean())
    assert out["gen_valid_prob"] == pytest.approx(
        gen_prob[gen_prob > 0].mean()
    )
    assert out["gen_valid_rate"] == pytest.approx((gen_prob > 0).mean())
    # valid = nonzero bridge likelihood: path 1 visits an inactive label yet
    # is valid via the fallback mapping; path 2 ends off the conditioned end
    # state, so its final bridge step (and hence its product) is exactly 0
    assert out["gen_valid_rate"] == pytest.approx(2 / 3)
    assert gen_prob[2] == 0.0 and gen_prob[1] > 0.0
    # JSD over visited-state histograms (10 bins over labels)
    assert out["gen_JSD"] == pytest.approx(
        jensen_shannon(ref_stateprobs, get_state_probs(gen_tp))
    )
    # ref_stateprobs comes from exact cMSM bridges of the same length
    assert ref_stateprobs.shape == (10,)
    assert ref_stateprobs.sum() == pytest.approx(1.0)


def test_reference_tps_metrics_zero_prob_paths():
    """A sparse MSM where a generated path takes an impossible step: its
    product likelihood is 0, so it counts in gen_prob's denominator but not
    in gen_valid_prob, and lowers gen_valid_rate."""
    T = np.array(
        [
            [0.9, 0.1, 0.0],
            [0.1, 0.8, 0.1],
            [0.0, 0.1, 0.9],
        ]
    )
    ev, V = np.linalg.eig(T.T)
    pi = np.real(V[:, np.argmin(np.abs(ev - 1))])
    pi = np.abs(pi) / np.abs(pi).sum()
    cmsm = MarkovStateModel(
        transition_matrix=T, active_set=np.arange(3), lag=1, pi=pi,
        n_full_states=3,
    )
    paths = np.array(
        [
            [0] * 10 + [1] * 10 + [2] * 10,  # possible
            [0] * 20 + [2] * 10,             # impossible 0->2 jump at ::10 res
        ]
    )
    out, _, gen_tp = reference_tps_metrics(
        paths, cmsm, 0, 2, n_bridge_samples=200,
        rng=np.random.default_rng(1),
    )
    mapped = map_to_active(gen_tp, cmsm)
    probs = ref_bridge_probs(mapped, T)
    gen_prob = probs.prod(-1)
    assert gen_prob[1] == 0.0 and gen_prob[0] > 0.0
    assert out["gen_valid_rate"] == pytest.approx(0.5)
    assert out["gen_prob"] == pytest.approx(gen_prob.mean())
    assert out["gen_valid_prob"] == pytest.approx(gen_prob[0])


def test_reference_replica_metrics_present_and_absent_states():
    cmsm = toy_cmsm()
    rng = np.random.default_rng(3)
    # replica trajectory over labels {0,1,3}: mixes well early, so the full
    # length has both endpoints; a short truncation sees only label 0
    seg = [0] * 40 + [1] * 40 + [3] * 40
    rep = np.array([0] * 100 + seg * 20)
    # bridge in active-index space mapped back to labels (see
    # reference_tps_metrics: identical to the reference when active=full)
    ref_tp = cmsm.active_set[
        sample_tp(cmsm.transition_matrix, 0, 2, 4, 300, rng=rng)
    ]
    ref_stateprobs = get_state_probs(ref_tp)
    out, sp_list = reference_replica_metrics(
        rep, cmsm, start_state=0, end_state=3,
        ref_stateprobs=ref_stateprobs,
        rep_lens=[len(rep), 50], rep_names=["full", "tiny"],
        msm_lag=2, traj_len=4, n_samples=200, rng=rng,
    )
    # full-length replica: real metrics
    assert 0 < out["full_rep_valid_rate"] <= 1
    assert out["full_rep_prob"] > 0
    assert 0 <= out["full_rep_JSD"] <= 1
    assert out["full_rep_prob"] == pytest.approx(out["full_repcheat_prob"])
    # truncated replica never visits the end state: reference sentinels
    assert out["tiny_rep_prob"] == 0
    assert out["tiny_rep_JSD"] == 1
    assert np.isnan(out["tiny_repcheat_prob"])
    assert len(sp_list) == 2 and np.all(sp_list[1] == 0)

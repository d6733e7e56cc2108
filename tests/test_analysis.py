"""Tests for the NumPy analysis toolkit (TICA / k-means / MSM / TP math)."""
import numpy as np
import pytest

from mdgen_tpu.analysis import (
    KMeans,
    TICA,
    estimate_markov_model,
    get_state_probs,
    get_tp_likelihood,
    jensen_shannon,
    pcca_assignments,
    sample_tp,
)
from mdgen_tpu.analysis.metrics import acovf, hist_jsd


def test_jsd_properties(rng):
    p = rng.random(50)
    q = rng.random(50)
    assert jensen_shannon(p, p) < 1e-10
    assert 0 <= jensen_shannon(p, q) <= 1.0
    assert abs(jensen_shannon(p, q) - jensen_shannon(q, p)) < 1e-12


def test_acovf_matches_definition(rng):
    x = rng.normal(size=500)
    got = acovf(x, 5, adjusted=True, demean=False)
    for k in range(6):
        expect = np.sum(x[: len(x) - k] * x[k:]) / (len(x) - k)
        np.testing.assert_allclose(got[k], expect, rtol=1e-8)


def test_tica_recovers_slow_direction(rng):
    """Two-dim signal: slow OU process in one direction, fast noise in the
    other — TICA-0 must align with the slow direction."""
    from scipy.signal import lfilter

    T = 20000
    slow = lfilter([0.05], [1.0, -0.999], rng.normal(size=T))
    fast = rng.normal(size=T)
    # mix into 2D
    X = np.stack([slow + 0.1 * fast, slow - 0.1 * fast], axis=1)
    tica = TICA(lag=100).fit(X)
    Y = tica.transform(X)
    # first component must correlate strongly with the slow process
    corr = np.corrcoef(Y[:, 0], slow)[0, 1]
    assert abs(corr) > 0.95


def test_kmeans_separates_clusters(rng):
    centers = np.array([[0, 0], [10, 0], [0, 10]])
    X = np.concatenate([c + rng.normal(size=(200, 2)) * 0.5 for c in centers])
    km = KMeans(k=3, seed=1).fit(X)
    labels = km.transform(X)
    # each true cluster maps to one dominant label
    for i in range(3):
        seg = labels[i * 200 : (i + 1) * 200]
        assert (seg == np.bincount(seg).argmax()).mean() > 0.99


def test_msm_recovers_transition_matrix(rng):
    P_true = np.array([[0.9, 0.1, 0.0], [0.1, 0.8, 0.1], [0.0, 0.2, 0.8]])
    n = 100000
    cum = P_true.cumsum(1)
    u = rng.random(n)
    states = np.zeros(n, dtype=int)
    s = 0
    for t in range(1, n):
        s = int(np.searchsorted(cum[s], u[t]))
        states[t] = s
    msm = estimate_markov_model(states, lag=1)
    np.testing.assert_allclose(msm.transition_matrix, P_true, atol=0.03)
    # stationary distribution check: pi P = pi
    np.testing.assert_allclose(
        msm.pi @ msm.transition_matrix, msm.pi, atol=1e-8
    )


def test_pcca_splits_block_chain():
    """Two 2-state blocks with rare inter-block hops -> 2 metastable sets."""
    eps = 0.01
    P = np.array(
        [
            [0.5 - eps / 2, 0.5 - eps / 2, eps / 2, eps / 2],
            [0.5 - eps / 2, 0.5 - eps / 2, eps / 2, eps / 2],
            [eps / 2, eps / 2, 0.5 - eps / 2, 0.5 - eps / 2],
            [eps / 2, eps / 2, 0.5 - eps / 2, 0.5 - eps / 2],
        ]
    )
    assign = pcca_assignments(P, 2)
    assert assign[0] == assign[1]
    assert assign[2] == assign[3]
    assert assign[0] != assign[2]


def test_sample_tp_endpoints_and_likelihood(rng):
    P = np.array([[0.8, 0.2, 0.0], [0.2, 0.6, 0.2], [0.0, 0.2, 0.8]])
    paths = sample_tp(P, 0, 2, traj_len=10, n_samples=64,
                      rng=np.random.default_rng(0))
    assert paths.shape == (64, 10)
    assert (paths[:, 0] == 0).all() and (paths[:, -1] == 2).all()
    # bridge-sampled paths have positive stepwise likelihood everywhere
    lik = get_tp_likelihood(paths, P)
    assert (lik > 0).all()
    probs = get_state_probs(paths, num_states=3)
    np.testing.assert_allclose(probs.sum(), 1.0)
    assert probs[1] > 0  # middle state must be visited on 0 -> 2 bridges

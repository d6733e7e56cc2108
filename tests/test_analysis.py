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


def test_jsd_is_scipy_jensenshannon(rng):
    """The reference's quality numbers are scipy.spatial.distance.jensenshannon
    (sqrt of natural-log JS divergence) on raw histogram counts — ours must be
    the identical function (reference scripts/analyze_peptide_sim.py:21,54)."""
    from scipy.spatial.distance import jensenshannon

    # histogram-count-like inputs, including zero bins
    p = np.floor(rng.random(100) * 20)
    q = np.floor(rng.random(100) * 20)
    p[::7] = 0
    q[::5] = 0
    assert jensen_shannon(p, q) == pytest.approx(float(jensenshannon(p, q)),
                                                 abs=0, rel=1e-15)
    # hand-computed definition: sqrt(0.5 KL(p||m) + 0.5 KL(q||m)), natural log
    pn, qn = p / p.sum(), q / q.sum()
    m = 0.5 * (pn + qn)
    kl = lambda a, b: np.sum(a[a > 0] * np.log(a[a > 0] / b[a > 0]))
    expect = np.sqrt(0.5 * kl(pn, m) + 0.5 * kl(qn, m))
    assert jensen_shannon(p, q) == pytest.approx(expect, rel=1e-12)


def test_featurizer_pyemma_interleaved_order(rng):
    """Backbone features must come out in pyemma's atom-index order
    (psi_0, phi_1, psi_1, ..., phi_{L-1}) so the reference's 2D JSD pairs at
    i in {1, 3} are true (phi_i, psi_i) Ramachandran pairs."""
    from mdgen_tpu.analysis.featurize import (
        describe_features,
        featurize_torsions,
        torsion_angles,
    )
    from mdgen_tpu.data import synthetic_trajectory
    from mdgen_tpu.geometry import constants as rc

    seq = "ACDE"
    L = len(seq)
    aatype = rc.str_sequence_to_aatype(seq)
    atom14 = synthetic_trajectory(seq, 6, seed=0)

    feats = featurize_torsions(atom14, aatype, sidechains=False, cossin=False)
    angles, _ = torsion_angles(atom14, aatype)  # [T, L, 7], [omega,phi,psi,...]
    assert feats.shape[1] == 2 * (L - 1)
    expect_cols = [angles[:, 0, 2]]  # psi_0
    for i in range(1, L - 1):
        expect_cols += [angles[:, i, 1], angles[:, i, 2]]  # phi_i, psi_i
    expect_cols.append(angles[:, L - 1, 1])  # phi_{L-1}
    np.testing.assert_allclose(feats, np.stack(expect_cols, 1), atol=1e-5)

    names = describe_features(aatype, sidechains=False)
    assert names[0].startswith("PSI") and names[1].startswith("PHI 0")
    assert [n.split()[0] for n in names[:4]] == ["PSI", "PHI", "PSI", "PHI"]
    # i in {1,3} pair (phi_i, psi_i) of residues 1 and 2
    assert names[1].split()[-1] == "1" and names[2].split()[-1] == "1"
    assert names[3].split()[-1] == "2" and names[4].split()[-1] == "2"

    # cossin doubles features as (cos, sin) pairs in the same order
    cs = featurize_torsions(atom14, aatype, sidechains=False, cossin=True)
    np.testing.assert_allclose(cs[:, 0], np.cos(feats[:, 0]), atol=1e-5)
    np.testing.assert_allclose(cs[:, 1], np.sin(feats[:, 0]), atol=1e-5)
    cs_names = describe_features(aatype, sidechains=False, cossin=True)
    assert cs_names[0] == f"COS({names[0]})" and cs_names[1] == f"SIN({names[0]})"

    # sidechain features append chi1-block, chi2-block, ... after backbone
    sc = featurize_torsions(atom14, aatype, sidechains=True, cossin=False)
    sc_names = describe_features(aatype, sidechains=True)
    assert sc.shape[1] == len(sc_names)
    chi_names = sc_names[2 * (L - 1):]
    assert all(n.startswith("CHI") for n in chi_names)
    ks = [int(n[3]) for n in chi_names]
    assert ks == sorted(ks)


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

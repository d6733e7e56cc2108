"""Tests for interpolant paths, flow-matching losses, and samplers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgen_tpu.transport import (
    Sampler,
    Transport,
    TransportConfig,
    make_plan,
)
from mdgen_tpu.transport import integrators
from mdgen_tpu.transport.dirichlet import DirichletConditionalFlow, simplex_proj


@pytest.mark.parametrize("path_type", ["Linear", "GVP"])
def test_interpolant_endpoints(path_type, rng):
    plan = make_plan(path_type)
    x0 = jnp.asarray(rng.normal(size=(4, 8)))
    x1 = jnp.asarray(rng.normal(size=(4, 8)))
    xt0, _ = plan.interpolate(jnp.zeros(4), x0, x1)
    xt1, _ = plan.interpolate(jnp.ones(4), x0, x1)
    np.testing.assert_allclose(np.asarray(xt0), np.asarray(x0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xt1), np.asarray(x1), atol=1e-6)


@pytest.mark.parametrize("path_type", ["Linear", "GVP", "VP"])
def test_ut_is_time_derivative_of_xt(path_type, rng):
    plan = make_plan(path_type)
    x0 = jnp.asarray(rng.normal(size=(4, 8)))
    x1 = jnp.asarray(rng.normal(size=(4, 8)))
    t = jnp.full((4,), 0.5)
    h = 1e-3
    xt_p, _ = plan.interpolate(t + h, x0, x1)
    xt_m, _ = plan.interpolate(t - h, x0, x1)
    _, ut = plan.interpolate(t, x0, x1)
    fd = (np.asarray(xt_p) - np.asarray(xt_m)) / (2 * h)
    # float32 central differences: ~1e-3 absolute accuracy
    np.testing.assert_allclose(fd, np.asarray(ut), atol=5e-3)


def test_score_from_velocity_equals_gaussian_score(rng):
    plan = make_plan("GVP")
    x0 = jnp.asarray(rng.normal(size=(4, 8)))
    x1 = jnp.asarray(rng.normal(size=(4, 8)))
    t = jnp.full((4,), 0.3)
    xt, ut = plan.interpolate(t, x0, x1)
    sigma_t, _ = plan.sigma(0.3)
    score = plan.score_from_velocity(ut, xt, t)
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(-x0 / sigma_t), atol=1e-4
    )


def test_training_loss_velocity_zero_for_perfect_model(rng):
    """A model that returns the exact target velocity yields ~0 loss."""
    cfg = TransportConfig(path_type="GVP", prediction="velocity")
    transport = Transport(cfg)
    x1 = jnp.asarray(rng.normal(size=(4, 6, 3, 5)).astype(np.float32))
    mask = jnp.ones_like(x1)

    captured = {}

    def oracle(xt, t, **kw):
        # invert the interpolation: we stored x0 via closure capture
        return captured["ut"]

    # monkey-style: run once to capture (x0, ut) with the same rng
    key = jax.random.PRNGKey(0)
    k_t, k_x0, _ = jax.random.split(key, 3)
    t = jax.random.uniform(k_t, (4,), jnp.float32)
    x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
    _, ut = transport.plan.interpolate(t, x0, x1)
    captured["ut"] = ut

    out = transport.training_losses(key, oracle, x1, mask=mask)
    np.testing.assert_allclose(np.asarray(out["loss"]), 0.0, atol=1e-9)


def test_training_loss_respects_mask(rng):
    cfg = TransportConfig()
    transport = Transport(cfg)
    x1 = jnp.asarray(rng.normal(size=(2, 4, 3, 5)).astype(np.float32))
    mask = jnp.zeros_like(x1).at[:, :, :, 0].set(1.0)

    def model(xt, t, **kw):
        # wrong everywhere except channel 0, where it's cheating-impossible;
        # the loss must only see channel 0
        return jnp.zeros_like(xt)

    out = transport.training_losses(jax.random.PRNGKey(1), model, x1, mask=mask)
    # recompute expected: mean over channel-0 elements of ut^2
    k_t, k_x0, _ = jax.random.split(jax.random.PRNGKey(1), 3)
    t = jax.random.uniform(k_t, (2,), jnp.float32)
    x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
    _, ut = transport.plan.interpolate(t, x0, x1)
    expect = np.mean(np.asarray(ut[:, :, :, 0]) ** 2, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out["loss"]), expect, rtol=1e-5)


# ---------------------------------------------------------------------------
# Integrators
# ---------------------------------------------------------------------------


def test_euler_heun_dopri_agree_on_linear_ode():
    f = lambda x, t: -x
    x0 = jnp.ones((2, 4))
    exact = np.exp(-1.0)
    for solver, tol in [
        (lambda: integrators.ode_euler(f, x0, 0.0, 1.0, 2000), 1e-3),
        (lambda: integrators.ode_heun(f, x0, 0.0, 1.0, 200), 1e-5),
        (lambda: integrators.ode_dopri5(f, x0, 0.0, 1.0), 1e-4),
    ]:
        np.testing.assert_allclose(np.asarray(solver()), exact, atol=tol)


def test_ode_sampler_transports_noise_to_target(rng):
    """With the closed-form optimal velocity for a point target, the ODE
    sampler must map any noise draw to the target."""
    cfg = TransportConfig(path_type="GVP")
    transport = Transport(cfg)
    target = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))

    def model(x, t, **kw):
        # clamp sigma well away from 0: RK stages evaluate at t=1 where the
        # exact conditional velocity is stiff (the real denoiser is smooth)
        plan = transport.plan
        te = t.reshape(-1, 1)
        alpha_t, d_alpha = plan.alpha(te)
        sigma_t, d_sigma = plan.sigma(te)
        x0_hat = (x - alpha_t * target) / jnp.maximum(sigma_t, 3e-2)
        return d_alpha * target + d_sigma * x0_hat

    sampler = Sampler(transport)
    xs = jax.random.normal(jax.random.PRNGKey(2), (4, 8))

    for method, steps in [("euler", 400), ("heun", 200), ("dopri5", 0)]:
        fn = sampler.sample_ode(model, sampling_method=method, num_steps=max(steps, 2))
        out = np.asarray(fn(xs))
        np.testing.assert_allclose(
            out, np.broadcast_to(np.asarray(target), out.shape), atol=8e-2
        )


def test_sde_sampler_transports_noise_to_target(rng):
    # SBDM diffusion diverges at exactly t=0, so start at sample_eps
    cfg = TransportConfig(path_type="GVP", sample_eps=1e-3)
    transport = Transport(cfg)
    target = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))

    def model(x, t, **kw):
        plan = transport.plan
        te = t.reshape(-1, 1)
        alpha_t, d_alpha = plan.alpha(te)
        sigma_t, d_sigma = plan.sigma(te)
        x0_hat = (x - alpha_t * target) / jnp.maximum(sigma_t, 3e-2)
        return d_alpha * target + d_sigma * x0_hat

    sampler = Sampler(transport)
    fn = sampler.sample_sde(model, num_steps=300)
    xs = jax.random.normal(jax.random.PRNGKey(3), (4, 8))
    out = np.asarray(fn(jax.random.PRNGKey(4), xs))
    # SDE stops at t1=0.96 (Mean last step): residual noise sigma(t1) ~ 0.06
    np.testing.assert_allclose(
        out, np.broadcast_to(np.asarray(target), out.shape), atol=0.25
    )


def test_samplers_jit_compile(rng):
    cfg = TransportConfig()
    transport = Transport(cfg)
    model = lambda x, t, **kw: -x
    sampler = Sampler(transport)
    fn = jax.jit(sampler.sample_ode(model, sampling_method="dopri5"))
    out = fn(jnp.ones((2, 4)))
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# Dirichlet conditional flow
# ---------------------------------------------------------------------------


def test_c_factor_matches_host_scipy(rng):
    """Golden: device-side c_factor vs an independent host recomputation of
    the reference math (reference `mdgen/utils.py:44-56`)."""
    import scipy.special

    K = 20
    spacing = 0.001
    flow = DirichletConditionalFlow(K=K, alpha_max=8.0, alpha_spacing=spacing)
    alphas = np.arange(1.0, 8.0 + spacing, spacing)
    bs_grid = np.linspace(0, 1, 1000)
    cdfs = scipy.special.betainc(alphas[:, None], K - 1, bs_grid[None, :])
    deriv = np.diff(cdfs, axis=0) / spacing

    bs = rng.uniform(0.01, 0.6, size=(16,))
    for alpha in [1.5, 3.0, 6.9]:
        beta = scipy.special.beta(alpha, K - 1)
        beta_div = np.where(bs < 1, beta / ((1 - bs) ** (K - 1)), 0)
        beta_div_full = np.where(
            (bs ** (alpha - 1)) > 0, beta_div / (bs ** (alpha - 1)), 0
        )
        I_func = deriv[np.argmin(np.abs(alpha - alphas))]
        expect = -np.interp(bs, bs_grid, I_func) * beta_div_full

        got = np.asarray(flow.c_factor(jnp.asarray(bs), jnp.asarray(alpha)))
        np.testing.assert_allclose(got, expect, rtol=2e-3, atol=1e-5)


def test_c_factor_jit_safe():
    flow = DirichletConditionalFlow(K=20, alpha_max=8.0, alpha_spacing=0.01)

    @jax.jit
    def run(bs, alpha):
        return flow.c_factor(bs, alpha)

    out = run(jnp.asarray([0.1, 0.5]), jnp.asarray(2.0))
    assert np.isfinite(np.asarray(out)).all()


def test_simplex_proj(rng):
    x = jnp.asarray(rng.normal(size=(8, 20)))
    p = np.asarray(simplex_proj(x))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    assert (p >= 0).all()
    # projecting a point already on the simplex is the identity
    q = np.abs(rng.normal(size=(4, 20)))
    q = q / q.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(simplex_proj(jnp.asarray(q))), q, atol=1e-5)


def test_sample_ode_likelihood_linear_field_dopri5(rng):
    """Exactly-linear velocity field v(x) = x has a closed-form likelihood:
    the flow from the N(0, I) base is x(1) = e * x(0), so
    log p(x) = log N(x / e; 0, I) - D. Hutchinson is exact for linear fields,
    so dopri5 must hit this to solver tolerance (reference integrates the
    augmented system with torchdiffeq dopri5, transport.py:453-511)."""
    import jax

    from mdgen_tpu.transport import Sampler, Transport, TransportConfig

    transport = Transport(TransportConfig(path_type="GVP"))
    sampler = Sampler(transport)
    model_fn = lambda x, t, **kw: x

    x = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    D = 12
    expect_z = x * np.exp(-1.0)
    expect_logp = (
        -0.5 * D * np.log(2 * np.pi)
        - 0.5 * np.asarray((expect_z**2).sum(axis=(1, 2)))
        - D
    )

    lik = sampler.sample_ode_likelihood(model_fn, sampling_method="dopri5")
    logp, z = jax.jit(lik)(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(z), np.asarray(expect_z), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logp), expect_logp, atol=1e-3)

    # euler converges to the same numbers with enough steps
    lik_e = sampler.sample_ode_likelihood(
        model_fn, sampling_method="euler", num_steps=2000
    )
    logp_e, z_e = lik_e(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(z_e), np.asarray(expect_z), atol=2e-3)
    np.testing.assert_allclose(np.asarray(logp_e), expect_logp, atol=2e-2)


def test_sample_ode_likelihood_standard_normal_model(rng):
    """Zero velocity field = the model distribution IS the prior: logp must
    equal the standard-normal log density of the data point exactly."""
    import jax

    from mdgen_tpu.transport import Sampler, Transport, TransportConfig

    transport = Transport(TransportConfig(path_type="GVP"))
    sampler = Sampler(transport)
    model_fn = lambda x, t, **kw: jnp.zeros_like(x)

    x = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
    expect = -0.5 * 5 * np.log(2 * np.pi) - 0.5 * np.asarray((x**2).sum(1))
    for method in ("dopri5", "euler", "heun"):
        lik = sampler.sample_ode_likelihood(model_fn, sampling_method=method,
                                            num_steps=20)
        logp, z = lik(jax.random.PRNGKey(1), x)
        np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(logp), expect, rtol=1e-5)

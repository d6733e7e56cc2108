"""Stochastic-interpolant coupling plans (Linear / GVP / VP), pure jnp.

Functional rebuild of the SiT path module (reference
`mdgen/transport/path.py:17,138,173`): each plan is a stateless object whose
methods are closed-form scalar schedules broadcast against the data — exactly
the shape XLA fuses into the surrounding elementwise graph. Interpolation
convention: ``x_t = alpha_t * x1 + sigma_t * x0`` with x0 ~ N(0, I) noise and
x1 data; alpha grows from 0 to 1 as t goes 0 -> 1.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def expand_t(t, x):
    """Broadcast a [B] (or already-expanded) time vector against [B, ...] data."""
    return jnp.reshape(t, (x.shape[0], *([1] * (x.ndim - 1))))


class LinearPlan:
    """alpha_t = t, sigma_t = 1 - t."""

    def alpha(self, t):
        return t, jnp.ones_like(t)

    def sigma(self, t):
        return 1 - t, -jnp.ones_like(t)

    def d_alpha_over_alpha(self, t):
        return 1 / t

    # -- SDE decomposition ---------------------------------------------------

    def drift(self, x, t):
        """Score-parametrized forward drift: returns (-mean, diffusion)."""
        t = expand_t(t, x)
        ratio = self.d_alpha_over_alpha(t)
        sigma_t, d_sigma_t = self.sigma(t)
        drift = ratio * x
        diffusion = ratio * sigma_t**2 - sigma_t * d_sigma_t
        return -drift, diffusion

    def diffusion(self, x, t, form="SBDM", norm=1.0):
        t = expand_t(t, x)
        if form == "constant":
            return jnp.asarray(norm)
        if form == "SBDM":
            return norm * self.drift(x, t)[1]
        if form == "sigma":
            return norm * self.sigma(t)[0]
        if form == "linear":
            return norm * (1 - t)
        if form == "decreasing":
            return 0.25 * (norm * jnp.cos(jnp.pi * t) + 1) ** 2
        if form == "increasing-decreasing":
            return norm * jnp.sin(jnp.pi * t) ** 2
        raise NotImplementedError(f"diffusion form {form}")

    # -- parametrization converters -------------------------------------------

    def score_from_velocity(self, velocity, x, t):
        t = expand_t(t, x)
        alpha_t, d_alpha_t = self.alpha(t)
        sigma_t, d_sigma_t = self.sigma(t)
        rev = alpha_t / d_alpha_t
        var = sigma_t**2 - rev * d_sigma_t * sigma_t
        return (rev * velocity - x) / var

    def noise_from_velocity(self, velocity, x, t):
        t = expand_t(t, x)
        alpha_t, d_alpha_t = self.alpha(t)
        sigma_t, d_sigma_t = self.sigma(t)
        rev = alpha_t / d_alpha_t
        var = rev * d_sigma_t - sigma_t
        return (rev * velocity - x) / var

    def velocity_from_score(self, score, x, t):
        drift, var = self.drift(x, t)
        return var * score - drift

    # -- interpolation --------------------------------------------------------

    def interpolate(self, t, x0, x1):
        """Returns (x_t, u_t): the noisy sample and the target velocity."""
        te = expand_t(t, x1)
        alpha_t, d_alpha_t = self.alpha(te)
        sigma_t, d_sigma_t = self.sigma(te)
        xt = alpha_t * x1 + sigma_t * x0
        ut = d_alpha_t * x1 + d_sigma_t * x0
        return xt, ut


class GVPPlan(LinearPlan):
    """Trigonometric (variance-preserving geodesic) plan:
    alpha_t = sin(pi t / 2), sigma_t = cos(pi t / 2). The reference default."""

    def alpha(self, t):
        return jnp.sin(t * jnp.pi / 2), jnp.pi / 2 * jnp.cos(t * jnp.pi / 2)

    def sigma(self, t):
        return jnp.cos(t * jnp.pi / 2), -jnp.pi / 2 * jnp.sin(t * jnp.pi / 2)

    def d_alpha_over_alpha(self, t):
        return jnp.pi / (2 * jnp.tan(t * jnp.pi / 2))


class VPPlan(LinearPlan):
    """VP-SDE schedule re-parametrized to the t:0->1 = noise->data direction."""

    def __init__(self, sigma_min=0.1, sigma_max=20.0):
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def _log_mean(self, t):
        return (
            -0.25 * (1 - t) ** 2 * (self.sigma_max - self.sigma_min)
            - 0.5 * (1 - t) * self.sigma_min
        )

    def _d_log_mean(self, t):
        return 0.5 * (1 - t) * (self.sigma_max - self.sigma_min) + 0.5 * self.sigma_min

    def alpha(self, t):
        alpha_t = jnp.exp(self._log_mean(t))
        return alpha_t, alpha_t * self._d_log_mean(t)

    def sigma(self, t):
        p = 2 * self._log_mean(t)
        sigma_t = jnp.sqrt(1 - jnp.exp(p))
        d_sigma_t = jnp.exp(p) * (2 * self._d_log_mean(t)) / (-2 * sigma_t)
        return sigma_t, d_sigma_t

    def d_alpha_over_alpha(self, t):
        return self._d_log_mean(t)

    def drift(self, x, t):
        t = expand_t(t, x)
        beta_t = self.sigma_min + (1 - t) * (self.sigma_max - self.sigma_min)
        return -0.5 * beta_t * x, beta_t / 2


PLANS = {"Linear": LinearPlan, "GVP": GVPPlan, "VP": VPPlan}


def make_plan(path_type: str):
    return PLANS[path_type]()

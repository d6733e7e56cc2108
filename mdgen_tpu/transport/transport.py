"""Flow-matching transport: training losses, parametrization conversion,
and jit-compiled samplers.

Functional rebuild of the vendored SiT transport module (reference
`mdgen/transport/transport.py:61,138,279,514`). Differences by design:

  * ``training_losses`` is a pure function of (rng, model_fn, batch) — no
    hidden torch RNG state — so the whole train step jits and shards.
  * Samplers close over a drift function and return jit-friendly callables
    whose entire integration loop lives on-device (see ``integrators``).
  * Dirichlet flow matching for design runs fully on-device (see
    ``dirichlet``), instead of the reference's per-ODE-step SciPy round-trip
    (reference `mdgen/model/latent_model.py:301`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import integrators
from .paths import expand_t, make_plan


def t_to_alpha(t, alpha_max: float):
    """Linear map from flow time to Dirichlet concentration
    (reference `mdgen/transport/transport.py:53-58`)."""
    return (1 - t) + t * alpha_max, (alpha_max - 1)


def mean_flat(x, mask):
    """Masked mean over all non-batch axes -> [B]."""
    axes = tuple(range(1, x.ndim))
    return jnp.sum(x * mask, axis=axes) / jnp.sum(mask, axis=axes)


@dataclass(frozen=True)
class TransportConfig:
    path_type: str = "GVP"  # Linear | GVP | VP
    prediction: str = "velocity"  # velocity | score | noise
    loss_weight: Optional[str] = None  # None | velocity | likelihood
    train_eps: Optional[float] = None
    sample_eps: Optional[float] = None
    # design / discrete flow settings
    design: bool = False
    dynamic_mpnn: bool = False
    mpnn: bool = False
    alpha_max: float = 8.0
    discrete_loss_weight: float = 0.5

    def resolved_eps(self):
        """Default eps per path/prediction combination (reference
        `mdgen/transport/transport.py:555-563`)."""
        train_eps, sample_eps = self.train_eps, self.sample_eps
        if self.path_type == "VP":
            train_eps = 1e-5 if train_eps is None else train_eps
            sample_eps = 1e-3 if sample_eps is None else sample_eps
        elif self.prediction != "velocity":
            train_eps = 1e-3 if train_eps is None else train_eps
            sample_eps = 1e-3 if sample_eps is None else sample_eps
        else:
            # velocity & [GVP, Linear] is stable everywhere; explicit values
            # (e.g. for SDE sampling, whose SBDM diffusion diverges at t=0)
            # are honored.
            train_eps = 0.0 if train_eps is None else train_eps
            sample_eps = 0.0 if sample_eps is None else sample_eps
        return train_eps, sample_eps


class Transport:
    def __init__(self, cfg: TransportConfig):
        self.cfg = cfg
        self.plan = make_plan(cfg.path_type)
        self.train_eps, self.sample_eps = cfg.resolved_eps()

    # -- time interval -------------------------------------------------------

    def check_interval(self, *, sde=False, eval=False, reverse=False,
                       diffusion_form="SBDM", last_step_size=0.0):
        t0, t1 = 0.0, 1.0
        eps = self.sample_eps if eval else self.train_eps
        if self.cfg.path_type == "VP":
            t1 = 1 - eps if (not sde or last_step_size == 0) else 1 - last_step_size
        elif self.cfg.prediction != "velocity" or sde:
            t0 = (
                eps
                if (diffusion_form == "SBDM" and sde)
                or self.cfg.prediction != "velocity"
                else 0.0
            )
            t1 = 1 - eps if (not sde or last_step_size == 0) else 1 - last_step_size
        if reverse:
            t0, t1 = 1 - t0, 1 - t1
        return t0, t1

    # -- training -------------------------------------------------------------

    def training_losses(
        self,
        rng: jax.Array,
        model_fn: Callable,
        x1: jnp.ndarray,
        aatype1: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        model_kwargs: Optional[dict] = None,
    ) -> dict:
        """Flow-matching loss. ``model_fn(xt, t, **model_kwargs)`` is the
        denoiser forward; ``x1`` [B, T, L, D] is the data point; ``mask`` is
        the per-element loss mask.
        """
        cfg = self.cfg
        model_kwargs = model_kwargs or {}
        k_t, k_x0, k_dir = jax.random.split(rng, 3)

        B = x1.shape[0]
        t0, t1 = self.check_interval()
        t = jax.random.uniform(k_t, (B,), jnp.float32) * (t1 - t0) + t0
        x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
        xt, ut = self.plan.interpolate(t, x0, x1)

        if cfg.design:
            assert cfg.prediction == "velocity"
            if cfg.dynamic_mpnn or cfg.mpnn:
                t = jnp.ones_like(t)
                x_d = jnp.zeros((B, 1, x1.shape[2], 20), x1.dtype)
                x_d = jnp.broadcast_to(x_d, (B, xt.shape[1], x1.shape[2], 20))
            else:
                one_hot = jax.nn.one_hot(aatype1, 20, dtype=x1.dtype)  # [B, L, 20]
                alphas, _ = t_to_alpha(t, cfg.alpha_max)
                conc = 1 + one_hot * (alphas[:, None, None] - 1)
                x_d = jax.random.dirichlet(k_dir, conc)  # [B, L, 20]
                x_d = jnp.broadcast_to(
                    x_d[:, None], (B, xt.shape[1], *x_d.shape[1:])
                )
            xt = jnp.concatenate([xt, x_d], axis=-1)

        model_output = model_fn(xt, t, **model_kwargs)

        logits = None
        if cfg.design and not (cfg.dynamic_mpnn or cfg.mpnn):
            logits = model_output[..., -20:]
            model_output = model_output[..., :-20]

        terms = {"t": t, "pred": model_output}
        if not (cfg.dynamic_mpnn or cfg.mpnn):
            if cfg.prediction == "velocity":
                terms["loss"] = mean_flat((model_output - ut) ** 2, mask)
            else:
                _, drift_var = self.plan.drift(xt, t)
                sigma_t, _ = self.plan.sigma(expand_t(t, xt))
                if cfg.loss_weight == "velocity":
                    weight = (drift_var / sigma_t) ** 2
                elif cfg.loss_weight == "likelihood":
                    weight = drift_var / (sigma_t**2)
                else:
                    weight = 1.0
                if cfg.prediction == "noise":
                    terms["loss"] = mean_flat(weight * (model_output - x0) ** 2, mask)
                else:
                    terms["loss"] = mean_flat(
                        weight * (model_output * sigma_t + x0) ** 2, mask
                    )

        if cfg.design:
            if cfg.dynamic_mpnn or cfg.mpnn:
                logits = model_output  # [B, 1, L, 20] (singleton frame axis)
                terms["loss_continuous"] = jnp.full((B,), jnp.nan)
                loss_d = _cross_entropy(logits[:, 0], aatype1)
                terms["loss"] = loss_d
            else:
                terms["loss_continuous"] = terms["loss"]
                seq = jnp.broadcast_to(
                    aatype1[:, None, :], (B, logits.shape[1], aatype1.shape[-1])
                )
                loss_d = _cross_entropy(logits, seq)
                terms["loss"] = (
                    loss_d * cfg.discrete_loss_weight
                    + (1 - cfg.discrete_loss_weight) * terms["loss"]
                )
            terms["loss_discrete"] = loss_d
            terms["logits"] = logits
        return terms

    # -- drift / score --------------------------------------------------------

    def drift_fn(self, model_fn: Callable) -> Callable:
        """Probability-flow ODE drift under the configured parametrization."""
        pred = self.cfg.prediction

        def velocity_ode(x, t, **kw):
            return model_fn(x, t, **kw)

        def score_ode(x, t, **kw):
            drift_mean, drift_var = self.plan.drift(x, t)
            return -drift_mean + drift_var * model_fn(x, t, **kw)

        def noise_ode(x, t, **kw):
            drift_mean, drift_var = self.plan.drift(x, t)
            sigma_t, _ = self.plan.sigma(expand_t(t, x))
            score = model_fn(x, t, **kw) / -sigma_t
            return -drift_mean + drift_var * score

        return {"velocity": velocity_ode, "score": score_ode, "noise": noise_ode}[
            pred
        ]

    def score_fn(self, model_fn: Callable) -> Callable:
        pred = self.cfg.prediction
        if pred == "noise":
            return lambda x, t, **kw: model_fn(x, t, **kw) / -self.plan.sigma(
                expand_t(t, x)
            )[0]
        if pred == "score":
            return lambda x, t, **kw: model_fn(x, t, **kw)
        return lambda x, t, **kw: self.plan.score_from_velocity(
            model_fn(x, t, **kw), x, t
        )


def _cross_entropy(logits, labels):
    """Token-mean cross entropy over 20 classes (matches
    ``F.cross_entropy(logits.reshape(-1,20), labels.reshape(-1))``). Labels
    broadcast against the logits' batch shape (mpnn logits keep a singleton
    frame axis)."""
    labels = jnp.broadcast_to(labels, logits.shape[:-1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


class Sampler:
    """Builds jit-compatible sampling callables from a Transport."""

    def __init__(self, transport: Transport):
        self.transport = transport

    def sample_ode(
        self,
        model_fn: Callable,
        *,
        sampling_method: str = "dopri5",
        num_steps: int = 50,
        atol: float = 1e-6,
        rtol: float = 1e-3,
        reverse: bool = False,
    ) -> Callable:
        """Returns ``sample(x_init, **model_kwargs) -> x_final``."""
        drift = self.transport.drift_fn(model_fn)
        if reverse:
            base = drift
            drift = lambda x, t, **kw: base(x, jnp.ones_like(t) * (1 - t), **kw)

        t0, t1 = self.transport.check_interval(sde=False, eval=True, reverse=reverse)

        def sample(x, **model_kwargs):
            f = lambda xx, tt: drift(xx, tt, **model_kwargs)
            if sampling_method == "euler":
                return integrators.ode_euler(f, x, t0, t1, num_steps)
            if sampling_method == "heun":
                return integrators.ode_heun(f, x, t0, t1, num_steps)
            if sampling_method == "dopri5":
                return integrators.ode_dopri5(f, x, t0, t1, rtol=rtol, atol=atol)
            raise NotImplementedError(sampling_method)

        return sample

    def sample_sde(
        self,
        model_fn: Callable,
        *,
        sampling_method: str = "Euler",
        diffusion_form: str = "SBDM",
        diffusion_norm: float = 1.0,
        last_step: Optional[str] = "Mean",
        last_step_size: float = 0.04,
        num_steps: int = 250,
    ) -> Callable:
        """Returns ``sample(rng, x_init, **model_kwargs) -> x_final`` with the
        reference's last-step options (Mean / Tweedie / Euler / None)."""
        transport = self.transport
        drift = transport.drift_fn(model_fn)
        score = transport.score_fn(model_fn)

        def diffusion(x, t, **kw):
            return transport.plan.diffusion(x, t, form=diffusion_form, norm=diffusion_norm)

        def sde_drift(x, t, **kw):
            return drift(x, t, **kw) + diffusion(x, t) * score(x, t, **kw)

        if last_step is None:
            last_step_size = 0.0
        t0, t1 = transport.check_interval(
            sde=True, eval=True, diffusion_form=diffusion_form,
            last_step_size=last_step_size,
        )

        def last_step_fn(x, t, **kw):
            if last_step is None:
                return x
            if last_step == "Mean":
                return x + sde_drift(x, t, **kw) * last_step_size
            if last_step == "Tweedie":
                alpha = transport.plan.alpha
                sigma = transport.plan.sigma
                a, _ = alpha(t1)
                s, _ = sigma(t1)
                return x / a + (s**2 / a) * score(x, t, **kw)
            if last_step == "Euler":
                return x + drift(x, t, **kw) * last_step_size
            raise NotImplementedError(last_step)

        def sample(rng, x, **model_kwargs):
            f = lambda xx, tt: sde_drift(xx, tt, **model_kwargs)
            g = lambda xx, tt: diffusion(xx, tt)
            if sampling_method == "Euler":
                xs = integrators.sde_euler_maruyama(f, g, rng, x, t0, t1, num_steps)
            elif sampling_method == "Heun":
                xs = integrators.sde_heun(f, g, rng, x, t0, t1, num_steps)
            else:
                raise NotImplementedError(sampling_method)
            tvec = jnp.full((x.shape[0],), t1, jnp.float32)
            return last_step_fn(xs, tvec, **model_kwargs)

        return sample

    def sample_ode_likelihood(
        self,
        model_fn: Callable,
        *,
        sampling_method: str = "dopri5",
        num_steps: int = 50,
        atol: float = 1e-6,
        rtol: float = 1e-3,
    ) -> Callable:
        """Hutchinson log-likelihood estimator; integrates the augmented
        (x, logp) system jointly data -> noise with the configured solver —
        adaptive dopri5 (the reference's torchdiffeq default,
        `mdgen/transport/transport.py:453-511`) or fixed-step euler/heun —
        using a JVP instead of torch autograd."""
        transport = self.transport
        drift = transport.drift_fn(model_fn)
        t0, t1 = transport.check_interval(sde=False, eval=True)

        def sample(rng, x_data, **model_kwargs):
            eps = (
                jax.random.randint(rng, x_data.shape, 0, 2).astype(x_data.dtype) * 2
                - 1
            )

            def aug_drift(state, t):
                x, _ = state
                rev_t = jnp.ones_like(t) * (1 - t)
                f = lambda xx: drift(xx, rev_t, **model_kwargs)
                fx, jvp = jax.jvp(f, (x,), (eps,))
                div = jnp.sum(jvp * eps, axis=tuple(range(1, x.ndim)))
                return (-fx, div)

            init = (x_data, jnp.zeros((x_data.shape[0],), x_data.dtype))
            if sampling_method == "dopri5":
                z, delta_logp = integrators.ode_dopri5(
                    aug_drift, init, t0, t1, rtol=rtol, atol=atol
                )
            elif sampling_method in ("euler", "heun"):
                fn = (
                    integrators.ode_euler
                    if sampling_method == "euler"
                    else integrators.ode_heun
                )
                z, delta_logp = fn(aug_drift, init, t0, t1, num_steps)
            else:
                raise NotImplementedError(sampling_method)
            dims = z[0].size
            prior_logp = -0.5 * dims * jnp.log(2 * jnp.pi) - 0.5 * jnp.sum(
                z**2, axis=tuple(range(1, z.ndim))
            )
            return prior_logp - delta_logp, z

        return sample


def create_transport(cfg: TransportConfig) -> Transport:
    return Transport(cfg)

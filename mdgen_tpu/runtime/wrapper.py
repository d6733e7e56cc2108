"""MDGenRuntime: the training/inference orchestrator.

Lightning-free rebuild of the reference wrapper (reference
`mdgen/wrapper.py:46-507`): explicit jitted train/val/inference steps, EMA,
optax optimization, and mesh-aware sharding. Every compute path — device
tokenization, batch prep, denoiser, flow losses, ODE sampling, atom14
reconstruction — is a single XLA program per (config, shape).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import MDGenConfig
from ..geometry import (
    Rigid,
    atom14_to_atom37,
    atom14_to_frames,
    atom37_to_atom14,
    atom37_to_torsions,
    frames_torsions_to_atom14,
)
from ..models import LatentMDGenModel
from ..parallel import batch_sharding, make_mesh, param_sharding, replicated
from ..tasks import decode_latents, prep_batch
from ..transport import Sampler, Transport, TransportConfig


def transport_config(cfg: MDGenConfig) -> TransportConfig:
    return TransportConfig(
        path_type=cfg.path_type,
        prediction=cfg.prediction,
        design=cfg.design,
        dynamic_mpnn=cfg.dynamic_mpnn,
        mpnn=cfg.mpnn,
        alpha_max=cfg.alpha_max,
        discrete_loss_weight=cfg.discrete_loss_weight,
    )


def tokenize_atom14(batch: dict, drop_left_context: bool = False) -> dict:
    """Raw atom14 windows -> (frames, torsions) tokens, on device.

    The reference tokenizes per-item in DataLoader worker processes
    (reference `mdgen/dataset.py:50-66`); here tokenization fuses into the
    jitted step so the host ships only raw coordinates.

    batch: {atom14 [B,T,L,14,3], seqres [B,L], mask [B,L]} ->
    reference-dataset contract {torsions, torsion_mask, trans, rots, seqres,
    mask}.

    ``drop_left_context``: the ATLAS dataset prepends one left-context
    residue column so the first cropped residue keeps its phi/omega
    supervision (the reference tokenizes the full chain before cropping,
    `mdgen/dataset.py:50-89`). The context residue's atoms feed the torsion
    quadruples via the prev-residue shift, then every output is sliced back
    to the crop width. A mask-0 context column (chain start) correctly
    invalidates the first residue's phi/omega through the atom mask.
    """
    atom14 = batch["atom14"].astype(jnp.float32)
    seqres, mask = batch["seqres"], batch["mask"]
    B, T, L = atom14.shape[:3]
    aatype_btl = jnp.broadcast_to(seqres[:, None], (B, T, L))

    frames = atom14_to_frames(atom14)
    atom37 = atom14_to_atom37(atom14, aatype_btl)
    atom37_mask = None
    if drop_left_context:
        from ..geometry import constants as rc

        atom37_mask = (
            jnp.asarray(rc.RESTYPE_ATOM37_MASK)[aatype_btl]
            * mask[:, None, :, None]
        )
    torsions, torsion_mask = atom37_to_torsions(
        atom37, aatype_btl, all_atom_mask=atom37_mask
    )
    if drop_left_context:
        torsions = torsions[:, :, 1:]
        torsion_mask = torsion_mask[:, :, 1:]
        frames = frames[:, :, 1:]
        seqres, mask = seqres[:, 1:], mask[:, 1:]

    # identity frames + zero torsion mask on padded residues (parity with the
    # host-side padding at reference `mdgen/dataset.py:80-89`)
    pad = (mask < 0.5)[:, None, :]  # B, 1, L
    eye = jnp.broadcast_to(jnp.eye(3, dtype=atom14.dtype), frames.rots.shape)
    rots = jnp.where(pad[..., None, None], eye, frames.rots)
    trans = jnp.where(pad[..., None], jnp.zeros_like(frames.trans), frames.trans)
    torsion_mask = torsion_mask[:, 0] * mask[..., None]

    return {
        "torsions": torsions,
        "torsion_mask": torsion_mask,
        "trans": trans,
        "rots": rots,
        "seqres": seqres,
        "mask": mask,
    }


def tokenize_no_frames(batch: dict) -> dict:
    """Raw atom14 -> atom37 batch for the no_frames ablation (reference
    `mdgen/dataset.py:58-65` contract: mask is the per-residue-type atom37
    mask)."""
    from ..geometry import constants as rc

    atom14 = batch["atom14"].astype(jnp.float32)
    seqres = batch["seqres"]
    B, T, L = atom14.shape[:3]
    aatype_btl = jnp.broadcast_to(seqres[:, None], (B, T, L))
    atom37 = atom14_to_atom37(atom14, aatype_btl)
    mask37 = jnp.asarray(rc.RESTYPE_ATOM37_MASK)[seqres]  # [B, L, 37]
    return {"atom37": atom37, "seqres": seqres, "mask": mask37}


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any  # mirrors params when cfg.ema, else None


def _inference_param_cast(cfg: MDGenConfig, params):
    """Pre-cast parameters to the compute dtype for sampling loops.

    XLA does not hoist the per-step f32->bf16 kernel casts out of the ODE
    scan, so without this every denoiser evaluation re-reads the full f32
    parameter set from HBM (measured: ~4x inference slowdown at small batch).
    """
    if cfg.precision != "bf16-mixed":
        return params
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )


class MDGenRuntime:
    def __init__(self, cfg: MDGenConfig, mesh=None):
        self.cfg = cfg
        # training model: fused_block is forward-only, keep it off here
        self.model = LatentMDGenModel(
            cfg.replace(fused_block=False), cfg.latent_dim, mesh=mesh
        )
        # Inference twin: same parameters, Pallas flash attention on the
        # frame axis and (when cfg.fused_block) the fused residue-attention
        # sublayer kernel (forward-only; sampling never differentiates).
        inf_cfg = (
            cfg.replace(attn_impl="flash")
            if cfg.attn_impl == "auto" and jax.default_backend() == "tpu"
            else cfg
        )
        self.model_inf = LatentMDGenModel(inf_cfg, cfg.latent_dim, mesh=mesh)
        self.transport = Transport(transport_config(cfg))
        self.sampler = Sampler(self.transport)
        self.mesh = mesh
        self.tx = self._make_optimizer()

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._val_step = jax.jit(self._val_step_impl)
        self._inference = jax.jit(self._inference_impl)
        self._rollout = jax.jit(
            self._rollout_impl, static_argnames=("num_rollouts",)
        )

    # ------------------------------------------------------------------

    def _make_optimizer(self):
        cfg = self.cfg
        opt = optax.adamw(cfg.lr) if cfg.adamW else optax.adam(cfg.lr)
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
        if cfg.accumulate_grad > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad)
        return tx

    # ------------------------------------------------------------------

    def _tokenize(self, batch: dict) -> dict:
        """Raw batches tokenize on device; reference-style token dicts pass
        through. ATLAS raw batches arrive with one left-context residue
        column (shape-detected: L == crop + 1) that tokenization consumes
        and drops."""
        cfg = self.cfg
        if "atom14" not in batch:
            return batch
        if cfg.no_frames:
            return tokenize_no_frames(batch)
        drop_ctx = cfg.atlas and batch["atom14"].shape[2] == cfg.crop + 1
        return tokenize_atom14(batch, drop_left_context=drop_ctx)

    def init(self, rng: jax.Array, example_batch: dict) -> TrainState:
        """Initialize parameters (optionally sharded over the mesh)."""
        cfg = self.cfg
        tok = self._tokenize(example_batch)
        prep = prep_batch(cfg, tok)
        B, T, L = prep.model_kwargs["mask"].shape
        x = jnp.zeros((B, T, L, cfg.latent_dim), jnp.float32)
        t = jnp.zeros((B,), jnp.float32)
        variables = self.model.init(rng, x, t, **prep.model_kwargs)
        params = variables["params"]
        if self.mesh is not None:
            shardings = param_sharding(self.mesh, params)
            params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        opt_state = self.tx.init(params)
        ema = jax.tree_util.tree_map(jnp.copy, params) if cfg.ema else None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=ema,
        )

    # ------------------------------------------------------------------

    def _loss_fn(self, params, rng, batch, train=True):
        cfg = self.cfg
        tok = self._tokenize(batch)
        prep = prep_batch(cfg, tok)

        # dropout is train-only (the reference's eval mode disables it)
        drop_rngs = None
        if train and cfg.dropout > 0.0:
            rng, k_drop = jax.random.split(rng)
            drop_rngs = {"dropout": k_drop}

        def model_fn(x, t, **kw):
            return self.model.apply({"params": params}, x, t, rngs=drop_rngs, **kw)

        out = self.transport.training_losses(
            rng,
            model_fn,
            prep.latents,
            aatype1=tok["seqres"] if cfg.design else None,
            mask=prep.loss_mask,
            model_kwargs=prep.model_kwargs,
        )
        loss = out["loss"].mean()
        metrics = {"loss": loss, "time": out["t"].mean()}
        if cfg.design:
            aa_out = jnp.argmax(out["logits"], axis=-1)
            seq = jnp.broadcast_to(
                tok["seqres"][:, None, :], aa_out.shape
            )
            rec = (aa_out == seq).astype(jnp.float32)
            metrics["category_pred_design_aa_recovery"] = rec[:, :, 1:-1].mean()
            metrics["category_pred_cond_aa_recovery"] = jnp.concatenate(
                [rec[:, :, 0:1], rec[:, :, -1:]], axis=2
            ).mean()
            metrics["loss_continuous"] = out["loss_continuous"].mean()
            metrics["loss_discrete"] = out["loss_discrete"].mean()
        return loss, metrics

    def _train_step_impl(self, state: TrainState, batch: dict, rng: jax.Array):
        cfg = self.cfg
        (_, metrics), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, rng, batch
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if cfg.ema:
            d = cfg.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + (1 - d) * p, ema, params
            )
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(
                step=state.step + 1, params=params, opt_state=opt_state,
                ema_params=ema,
            ),
            metrics,
        )

    def _val_step_impl(self, params, batch: dict, rng: jax.Array):
        _, metrics = self._loss_fn(params, rng, batch, train=False)
        return metrics

    # ------------------------------------------------------------------

    def _inference_impl(self, params, batch: dict, rng: jax.Array):
        """Full task inference: noise -> ODE sample -> atom14 + sequence
        (reference `mdgen/wrapper.py:405-484`)."""
        cfg = self.cfg
        tok = self._tokenize(batch)
        prep = prep_batch(cfg, tok)
        B, T, L = prep.model_kwargs["mask"].shape
        params_c = _inference_param_cast(cfg, params)

        def model_fn(x, t, **kw):
            return self.model_inf.apply(
                {"params": params_c}, x, t,
                method=self.model_inf.forward_inference, **kw,
            )

        if cfg.dynamic_mpnn or cfg.mpnn:
            x1 = prep.latents
            x_d = jnp.zeros((B, x1.shape[1], L, 20), x1.dtype)
            xt = jnp.concatenate([x1, x_d], axis=-1)
            logits = model_fn(xt, jnp.ones((B,)), **prep.model_kwargs)
            aa_out = jnp.argmax(logits, axis=-1)
            aatype = jnp.broadcast_to(tok["seqres"][:, None], (B, T, L))
            atom14 = frames_torsions_to_atom14(
                prep.rigids, tok["torsions"], aatype
            )
            return atom14, aa_out

        k_cont, k_disc = jax.random.split(rng)
        if cfg.design:
            zs_cont = jax.random.normal(k_cont, (B, T, L, cfg.latent_dim - 20))
            zs_disc = jax.random.dirichlet(k_disc, jnp.ones((B, L, 20)))
            zs_disc = jnp.broadcast_to(zs_disc[:, None], (B, T, L, 20))
            zs = jnp.concatenate([zs_cont, zs_disc], axis=-1)
        else:
            zs = jax.random.normal(k_cont, (B, T, L, cfg.latent_dim))

        sample_fn = self.sampler.sample_ode(
            model_fn,
            sampling_method=cfg.sampling_method,
            num_steps=cfg.inference_steps,
        )
        samples = sample_fn(zs, **prep.model_kwargs)
        if cfg.no_frames:
            # samples ARE flattened atom37 coordinates (reference
            # `mdgen/wrapper.py:449-454`)
            atom37 = samples.reshape(B, T, L, 37, 3)
            aatype = jnp.broadcast_to(tok["seqres"][:, None], (B, T, L))
            atom14 = atom37_to_atom14(atom37, aatype)
            return atom14, aatype
        return decode_latents(cfg, samples, prep.rigids, tok["seqres"])

    def _rollout_impl(self, params, start_atom14, seqres, mask, rng,
                      num_rollouts: int):
        """Autoregressive forward-simulation rollout, fully on-device.

        The reference loops rollouts in Python with a GPU->CPU re-tokenization
        between each (reference `sim_inference.py:61-116`); here the re-
        tokenization is jnp (atom14 -> frames/torsions under jit) and the whole
        R x (ODE solve) chain is one ``lax.scan``.

        start_atom14: [B, L, 14, 3]; returns [B, R*T, L, 14, 3].
        """
        cfg = self.cfg
        B, L = seqres.shape
        T = cfg.num_frames
        # hoist the compute-dtype cast above the rollout scan (idempotent:
        # _inference_impl's cast is a no-op on already-bf16 leaves)
        params = _inference_param_cast(cfg, params)

        def body(start, key):
            batch = {
                "atom14": jnp.broadcast_to(
                    start[:, None], (B, T, L, 14, 3)
                ),
                "seqres": seqres,
                "mask": mask,
            }
            atom14, _ = self._inference_impl(params, batch, key)
            return atom14[:, -1], atom14

        keys = jax.random.split(rng, num_rollouts)
        _, trajs = jax.lax.scan(body, start_atom14.astype(jnp.float32), keys)
        return jnp.moveaxis(trajs, 0, 1).reshape(B, num_rollouts * T, L, 14, 3)

    # -- public API ----------------------------------------------------------

    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    def val_step(self, params, batch, rng):
        return self._val_step(params, batch, rng)

    def inference(self, params, batch, rng):
        """Returns (atom14 [B,T,L,14,3], aa_out [B,T,L])."""
        return self._inference(params, batch, rng)

    def rollout(self, params, start_atom14, seqres, mask, rng, num_rollouts):
        """Forward-sim rollout: [B,L,14,3] start -> [B, R*T, L, 14, 3]."""
        return self._rollout(
            params, start_atom14, seqres, mask, rng, num_rollouts=num_rollouts
        )

    def grad_report(self, state: TrainState, batch, rng):
        """Per-parameter gradient norms (reference ``--check_grad``,
        `mdgen/wrapper.py:115-118`): returns {path: norm} so callers can warn
        about parameters that receive no gradient."""
        grads = jax.grad(lambda p: self._loss_fn(p, rng, batch)[0])(state.params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        return {
            "/".join(str(getattr(k, "key", k)) for k in kp): float(
                jnp.linalg.norm(leaf)
            )
            for kp, leaf in flat
        }

    def eval_params(self, state: TrainState):
        """Parameters to evaluate with: EMA when enabled (reference swaps EMA
        weights in for validation, `mdgen/wrapper.py:88-93`)."""
        return state.ema_params if self.cfg.ema else state.params

"""Task & conditioning layer: pure functions from raw batches to model inputs.

The four task modes (forward simulation, TPS/interpolation, upsampling,
inpainting/design) are defined entirely by conditioning masks over a shared
latent trajectory tensor. This module is the functional rebuild of the
reference's ``prep_batch`` and inference decode (reference
`mdgen/wrapper.py:283-365,405-484`), jit-safe: the config is static, so each
task compiles to a specialized mask program with static shapes.

Latent layout per frame/residue (cfg.latent_dim law — `config.py`):
  [offset tensor-7 (+7 reverse offsets for endpoint tasks) | 14 torsion
   sin/cos | 20 design simplex channels (design only)]
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .config import MDGenConfig
from .geometry import (
    Rigid,
    canonicalize_quat_sign,
    frames_torsions_to_atom14,
    get_offsets,
)

# Fixed residue index conventions for 4-residue inpainting/design tasks
# (reference `mdgen/wrapper.py:41-43`)
DESIGN_IDX = (1, 2)
COND_IDX = (0, 3)
DESIGN_MAP_TO_COND = (0, 0, 3, 3)


class PreparedBatch(NamedTuple):
    latents: jnp.ndarray  # [B, T, L, latent_dim]
    loss_mask: jnp.ndarray  # [B, T, L, latent_dim_continuous]
    rigids: Optional[Rigid]  # [B, T, L] (None in no_frames mode)
    model_kwargs: dict


def build_cond_mask(cfg: MDGenConfig, B: int, T: int, L: int) -> jnp.ndarray:
    """Conditioning mask over (B, T, L): which latent tokens are given.

    sim: frame 0; tps: frames 0 and -1; upsampling: every cond_interval-th
    frame; inpainting/mpnn: residues COND_IDX at all frames
    (reference `mdgen/wrapper.py:337-346`).
    """
    mask = jnp.zeros((B, T, L), dtype=jnp.int32)
    if cfg.sim_condition:
        mask = mask.at[:, 0].set(1)
    if cfg.tps_condition:
        mask = mask.at[:, 0].set(1)
        mask = mask.at[:, -1].set(1)
    if cfg.cond_interval:
        mask = mask.at[:, :: cfg.cond_interval].set(1)
    if cfg.inpainting or cfg.dynamic_mpnn or cfg.mpnn:
        mask = mask.at[:, :, jnp.asarray(COND_IDX)].set(1)
    return mask


def masked_aatype(cfg: MDGenConfig, seqres: jnp.ndarray) -> jnp.ndarray:
    """Replace designed positions with UNK=20 (reference
    `mdgen/wrapper.py:348-350,361`)."""
    if cfg.design:
        aa_mask = jnp.ones_like(seqres)
        aa_mask = aa_mask.at[:, jnp.asarray(DESIGN_IDX)].set(0)
        return jnp.where(aa_mask.astype(bool), seqres, 20)
    return seqres


def prep_batch(cfg: MDGenConfig, batch: dict) -> PreparedBatch:
    """Tokenized batch -> latents + loss mask + denoiser kwargs.

    batch: {torsions [B,T,L,7,2], torsion_mask [B,L,7], trans [B,T,L,3],
    rots [B,T,L,3,3], seqres [B,L], mask [B,L]}.
    """
    if cfg.no_frames:
        return prep_batch_no_frames(cfg, batch)

    rigids = Rigid(batch["rots"], batch["trans"])  # [B, T, L]
    B, T, L = rigids.batch_shape

    if cfg.design_key_frames:
        idx = jnp.asarray(DESIGN_MAP_TO_COND)
        rigids = Rigid.cat(
            [
                rigids[:, :1][:, :, idx],
                rigids[:, 1:-1],
                rigids[:, -1:][:, :, idx],
            ],
            axis=1,
        )

    if cfg.no_offsets:
        offsets = rigids.to_tensor_7()
    else:
        offsets = get_offsets(rigids[:, 0:1], rigids)
    offsets = canonicalize_quat_sign(offsets)

    frame_loss_mask = jnp.broadcast_to(batch["mask"][..., None], (B, L, 7))
    torsion_loss_mask = jnp.broadcast_to(
        batch["torsion_mask"][..., None], (B, L, 7, 2)
    ).reshape(B, L, 14)

    if cfg.tps_condition or cfg.inpainting or cfg.dynamic_mpnn:
        offsets_r = canonicalize_quat_sign(get_offsets(rigids[:, -1:], rigids))
        offsets = jnp.concatenate([offsets, offsets_r], axis=-1)
        frame_loss_mask = jnp.concatenate([frame_loss_mask, frame_loss_mask], axis=-1)

    torsions = batch["torsions"].reshape(B, T, L, 14)
    if cfg.no_torsion:
        torsions = jnp.zeros_like(torsions)
    elif cfg.no_design_torsion:
        torsions = torsions.at[:, :, jnp.asarray(DESIGN_IDX)].set(0.0)
    latents = jnp.concatenate([offsets, torsions], axis=-1)

    if cfg.supervise_all_torsions:
        torsion_loss_mask = jnp.ones_like(torsion_loss_mask)
    elif cfg.supervise_no_torsions:
        torsion_loss_mask = jnp.zeros_like(torsion_loss_mask)

    if cfg.chi_loss_weight != 1.0 or cfg.chi_loss_weights:
        # upweight the sidechain rotamer channels: torsions are ordered
        # (omega, phi, psi, chi1-4) -> sin/cos channels 6..13 are chi1-4.
        # The loss is a mask-weighted mean (transport.mean_flat), so this
        # shifts relative emphasis without changing the loss scale.
        w = jnp.ones((14,), jnp.float32).at[6:].set(cfg.chi_loss_weight)
        if cfg.chi_loss_weights:
            per_chi = [float(x) for x in cfg.chi_loss_weights.split(",")]
            if len(per_chi) != 4:
                raise ValueError(
                    f"chi_loss_weights needs 4 values, got {cfg.chi_loss_weights!r}"
                )
            w = w.at[6:].mul(jnp.repeat(jnp.asarray(per_chi, jnp.float32), 2))
        torsion_loss_mask = torsion_loss_mask.astype(jnp.float32) * w
        frame_loss_mask = frame_loss_mask.astype(jnp.float32)

    loss_mask = jnp.concatenate([frame_loss_mask, torsion_loss_mask], axis=-1)
    loss_mask = jnp.broadcast_to(loss_mask[:, None], (B, T, L, loss_mask.shape[-1]))

    cond_mask = build_cond_mask(cfg, B, T, L)

    model_kwargs = {
        "start_frames": rigids[:, 0],
        "end_frames": rigids[:, -1],
        "mask": jnp.broadcast_to(batch["mask"][:, None], (B, T, L)),
        "aatype": masked_aatype(cfg, batch["seqres"]),
        "x_cond": jnp.where(cond_mask[..., None].astype(bool), latents, 0.0),
        "x_cond_mask": cond_mask,
    }
    return PreparedBatch(latents, loss_mask, rigids, model_kwargs)


def prep_batch_no_frames(cfg: MDGenConfig, batch: dict) -> PreparedBatch:
    """Raw-atom37 ablation: latents are flattened coordinates
    (reference `mdgen/wrapper.py:254-280`). batch: {atom37 [B,T,L,37,3],
    seqres [B,L], mask [B,L,37]}."""
    B, T, L = batch["atom37"].shape[:3]
    latents = batch["atom37"].reshape(B, T, L, 111)
    mask = jnp.broadcast_to(batch["mask"][:, None, :, 1], (B, T, L))
    loss_mask = jnp.broadcast_to(
        batch["mask"][:, None, :, :, None], (B, T, L, 37, 3)
    ).reshape(B, T, L, 111)

    cond_mask = jnp.zeros((B, T, L), dtype=jnp.int32)
    if cfg.sim_condition:
        cond_mask = cond_mask.at[:, 0].set(1)

    model_kwargs = {
        "mask": mask,
        "aatype": batch["seqres"],
        "x_cond": jnp.where(cond_mask[..., None].astype(bool), latents, 0.0),
        "x_cond_mask": cond_mask,
    }
    return PreparedBatch(latents, loss_mask, None, model_kwargs)


def build_upsampling_windows(tok: dict, num_frames: int, cond_interval: int):
    """Pack a low-framerate token trajectory into inpainting windows.

    Each window holds ``num_frames // cond_interval`` kept frames at every
    ``cond_interval``-th slot, zeros + identity rotations in between
    (reference `upsampling_inference.py:47-66`).

    tok: single-trajectory token dict {torsions [T0,L,7,2], torsion_mask,
    trans, rots, seqres, mask}. Returns a list of window dicts (numpy).
    """
    import numpy as np

    kept_per_window = num_frames // cond_interval
    T0, L = tok["torsions"].shape[:2]
    n_windows = T0 // kept_per_window
    out = []
    for w in range(n_windows):
        sel = slice(w * kept_per_window, (w + 1) * kept_per_window)
        torsions = np.zeros((num_frames, L, 7, 2), np.float32)
        trans = np.zeros((num_frames, L, 3), np.float32)
        rots = np.broadcast_to(
            np.eye(3, dtype=np.float32), (num_frames, L, 3, 3)
        ).copy()
        torsions[::cond_interval] = tok["torsions"][sel]
        trans[::cond_interval] = tok["trans"][sel]
        rots[::cond_interval] = tok["rots"][sel]
        out.append(
            {
                "torsions": torsions,
                "torsion_mask": np.asarray(tok["torsion_mask"], np.float32),
                "trans": trans,
                "rots": rots,
                "seqres": np.asarray(tok["seqres"]),
                "mask": np.asarray(tok["mask"], np.float32),
            }
        )
    return out


def pad_window_groups(windows: list, batch_size: int):
    """Split ``windows`` into full batches of ``batch_size``, padding the
    trailing partial group by repeating its last element (static shapes ->
    no recompile). Yields ``(group, n_real)``; callers keep only the first
    ``n_real`` outputs of the padded group, so no trajectory tail is ever
    silently dropped (regression: upsampling_inference lost the tail at
    batch_size > 1)."""
    for i in range(0, len(windows), batch_size):
        group = windows[i : i + batch_size]
        n_real = len(group)
        if n_real < batch_size:
            group = group + [group[-1]] * (batch_size - n_real)
        yield group, n_real


def decode_latents(
    cfg: MDGenConfig,
    samples: jnp.ndarray,
    rigids: Rigid,
    seqres: jnp.ndarray,
):
    """Sampled latents -> atom14 coordinates + designed sequence
    (reference `mdgen/wrapper.py:449-484`). Pure jnp, jit-safe, so the
    autoregressive rollout re-tokenization never leaves the device."""
    B, T, L, _ = samples.shape
    offsets = samples[..., :7]
    if cfg.tps_condition or cfg.inpainting:
        torsions = samples[..., 14:28]
    else:
        torsions = samples[..., 7:21]
    logits = samples[..., -20:]

    if cfg.no_offsets:
        frames = Rigid.from_tensor_7(offsets, normalize_quats=True)
    else:
        frames = rigids[:, 0:1].compose(
            Rigid.from_tensor_7(offsets, normalize_quats=True)
        )
    torsions = torsions.reshape(B, T, L, 7, 2)
    if not cfg.oracle:
        torsions = torsions / jnp.linalg.norm(torsions, axis=-1, keepdims=True)
    aatype = jnp.broadcast_to(seqres[:, None], (B, T, L))
    atom14 = frames_torsions_to_atom14(frames, torsions, aatype)

    if cfg.design:
        aa_out = jnp.argmax(logits, axis=-1)
    else:
        aa_out = aatype
    return atom14, aa_out

"""Conditioning-mask and latent-layout tests for the four task modes."""
import jax.numpy as jnp
import numpy as np

from mdgen_tpu.config import MDGenConfig
from mdgen_tpu.geometry.rigid import quat_to_rotmat
from mdgen_tpu.tasks import build_cond_mask, decode_latents, prep_batch


def make_batch(rng, B=2, T=8, L=4):
    q = rng.normal(size=(B, T, L, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return {
        "torsions": jnp.asarray(rng.normal(size=(B, T, L, 7, 2)).astype(np.float32)),
        "torsion_mask": jnp.ones((B, L, 7), jnp.float32),
        "trans": jnp.asarray(rng.normal(size=(B, T, L, 3)).astype(np.float32)),
        "rots": quat_to_rotmat(jnp.asarray(q.astype(np.float32))),
        "seqres": jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32)),
        "mask": jnp.ones((B, L), jnp.float32),
    }


def test_cond_masks_per_task():
    B, T, L = 2, 10, 4
    m = np.asarray(build_cond_mask(MDGenConfig(sim_condition=True), B, T, L))
    assert m[:, 0].all() and m[:, 1:].sum() == 0

    m = np.asarray(build_cond_mask(MDGenConfig(tps_condition=True), B, T, L))
    assert m[:, 0].all() and m[:, -1].all() and m[:, 1:-1].sum() == 0

    m = np.asarray(build_cond_mask(MDGenConfig(cond_interval=5), B, T, L))
    assert m[:, 0].all() and m[:, 5].all() and m.sum() == 2 * 2 * L

    m = np.asarray(build_cond_mask(MDGenConfig(inpainting=True), B, T, L))
    assert m[:, :, 0].all() and m[:, :, 3].all() and m[:, :, 1:3].sum() == 0


def test_latent_dim_law():
    assert MDGenConfig(sim_condition=True).latent_dim == 21
    assert MDGenConfig(tps_condition=True).latent_dim == 28
    assert MDGenConfig(inpainting=True, design=True).latent_dim == 48
    assert MDGenConfig(no_frames=True).latent_dim == 111


def test_prep_batch_sim_layout(rng):
    cfg = MDGenConfig(sim_condition=True, num_frames=8, crop=4)
    batch = make_batch(rng)
    prep = prep_batch(cfg, batch)
    B, T, L = 2, 8, 4
    assert prep.latents.shape == (B, T, L, 21)
    # offset at frame 0 is the identity (w=1, rest 0)
    off0 = np.asarray(prep.latents)[:, 0, :, :7]
    np.testing.assert_allclose(off0[..., 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(off0[..., 1:], 0.0, atol=1e-4)
    # quaternions canonicalized: w >= 0 everywhere
    assert (np.asarray(prep.latents)[..., 0] >= -1e-6).all()
    # torsion channels match input
    np.testing.assert_allclose(
        np.asarray(prep.latents)[..., 7:],
        np.asarray(batch["torsions"]).reshape(B, T, L, 14),
    )
    # conditioned tokens carry data, others zero
    xc = np.asarray(prep.model_kwargs["x_cond"])
    assert np.abs(xc[:, 1:]).sum() == 0
    np.testing.assert_allclose(xc[:, 0], np.asarray(prep.latents)[:, 0])


def test_prep_batch_tps_reverse_offsets(rng):
    cfg = MDGenConfig(tps_condition=True, num_frames=8, crop=4)
    prep = prep_batch(cfg, make_batch(rng))
    lat = np.asarray(prep.latents)
    assert lat.shape[-1] == 28
    # forward offsets identity at frame 0; reverse offsets identity at last
    np.testing.assert_allclose(lat[:, 0, :, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(lat[:, -1, :, 7], 1.0, atol=1e-4)
    np.testing.assert_allclose(lat[:, -1, :, 8:14], 0.0, atol=1e-4)


def test_decode_latents_roundtrips_prep(rng):
    """Encoding frames+torsions into latents and decoding them back must
    reproduce the original backbone (the autoregressive rollout contract)."""
    cfg = MDGenConfig(sim_condition=True, num_frames=8, crop=4)
    batch = make_batch(rng)
    prep = prep_batch(cfg, batch)
    atom14, aa = decode_latents(cfg, prep.latents, prep.rigids, batch["seqres"])
    assert atom14.shape == (2, 8, 4, 14, 3)
    # N/CA/C positions equal the frame translations' rigid placement: compare
    # CA (atom14 slot 1) against original frame translations
    np.testing.assert_allclose(
        np.asarray(atom14)[..., 1, :], np.asarray(batch["trans"]), atol=2e-3
    )


def test_upsampling_window_packing(rng):
    from mdgen_tpu.tasks import build_upsampling_windows

    T0, L = 20, 4
    tok = {
        "torsions": rng.normal(size=(T0, L, 7, 2)).astype(np.float32),
        "torsion_mask": np.ones((L, 7), np.float32),
        "trans": rng.normal(size=(T0, L, 3)).astype(np.float32),
        "rots": np.broadcast_to(np.eye(3, dtype=np.float32), (T0, L, 3, 3)).copy(),
        "seqres": rng.integers(0, 20, size=(L,)).astype(np.int32),
        "mask": np.ones(L, np.float32),
    }
    windows = build_upsampling_windows(tok, num_frames=50, cond_interval=10)
    assert len(windows) == 4  # 20 kept frames / 5 per window
    w0 = windows[0]
    assert w0["trans"].shape == (50, L, 3)
    # kept frames land every cond_interval-th slot
    np.testing.assert_array_equal(w0["trans"][::10], tok["trans"][:5])
    np.testing.assert_array_equal(w0["torsions"][::10], tok["torsions"][:5])
    # gaps: zero translations, identity rotations
    assert np.abs(w0["trans"][1:10]).sum() == 0
    np.testing.assert_array_equal(
        w0["rots"][3], np.broadcast_to(np.eye(3, dtype=np.float32), (L, 3, 3))
    )
    # second window continues where the first left off
    np.testing.assert_array_equal(windows[1]["trans"][::10], tok["trans"][5:10])


def test_pad_window_groups_keeps_tail():
    """Trailing partial batches are padded (static shapes) and flagged with
    n_real so callers drop only the padding (regression: upsampling CLI
    silently lost the trajectory tail at batch_size > 1)."""
    from mdgen_tpu.tasks import pad_window_groups

    windows = list(range(7))
    groups = list(pad_window_groups(windows, 3))
    assert [n for _, n in groups] == [3, 3, 1]
    assert all(len(g) == 3 for g, _ in groups)
    assert groups[-1][0] == [6, 6, 6]
    # batch divides evenly: no padding
    assert [n for _, n in pad_window_groups(list(range(6)), 3)] == [3, 3]


def test_chi_loss_weight_scales_sidechain_channels(rng):
    """--chi_loss_weight multiplies only the chi1-4 sin/cos loss channels
    (torsion channels 6..13); offsets and backbone channels are untouched."""
    batch = make_batch(rng)
    batch["torsion_mask"] = batch["torsion_mask"].at[:, 0, 3].set(0.0)
    base = prep_batch(MDGenConfig(sim_condition=True), batch)
    weighted = prep_batch(
        MDGenConfig(sim_condition=True, chi_loss_weight=5.0), batch
    )
    lm_b = np.asarray(base.loss_mask)
    lm_w = np.asarray(weighted.loss_mask)
    np.testing.assert_allclose(lm_w[..., :13], lm_b[..., :13])  # 7 off + bb
    np.testing.assert_allclose(lm_w[..., 13:], lm_b[..., 13:] * 5.0)
    # masked torsions stay masked (0 * w == 0): chi1 of residue 0
    assert (lm_w[:, :, 0, 13:15] == 0).all()


def test_chi_loss_weights_per_chi(rng):
    """--chi_loss_weights 'w1,w2,w3,w4' scales each chi's sin/cos pair
    independently, multiplied on top of the scalar --chi_loss_weight."""
    import pytest

    batch = make_batch(rng)
    base = prep_batch(MDGenConfig(sim_condition=True), batch)
    weighted = prep_batch(
        MDGenConfig(
            sim_condition=True, chi_loss_weight=2.0, chi_loss_weights="1,1,1,4"
        ),
        batch,
    )
    lm_b = np.asarray(base.loss_mask)
    lm_w = np.asarray(weighted.loss_mask)
    # offsets + backbone torsions untouched (channels 0..12)
    np.testing.assert_allclose(lm_w[..., :13], lm_b[..., :13])
    # chi1-3 pairs get the scalar weight only
    np.testing.assert_allclose(lm_w[..., 13:19], lm_b[..., 13:19] * 2.0)
    # chi4 pair gets scalar * per-chi (2 * 4 = 8)
    np.testing.assert_allclose(lm_w[..., 19:21], lm_b[..., 19:21] * 8.0)
    with pytest.raises(ValueError, match="chi_loss_weights"):
        prep_batch(
            MDGenConfig(sim_condition=True, chi_loss_weights="1,2"), batch
        )

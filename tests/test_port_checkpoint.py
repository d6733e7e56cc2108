"""End-to-end test of tools/port_checkpoint.py: a reference Lightning .ckpt
(state_dict under ``model.`` + ``ema`` dict + ``hyper_parameters.args``,
reference `mdgen/wrapper.py:50,107-130`) ports to a native checkpoint dir
that the standard inference load path restores.

Reuses test_model_golden's reference-model scaffolding (esm/Bio stubs);
skipped when the read-only reference checkout is absent.
"""
import argparse
import dataclasses
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mdgen"), reason="reference not available"
)

if os.path.isdir("/root/reference/mdgen"):
    import test_model_golden as golden  # installs the esm/Bio/torchdiffeq stubs
    import torch


def test_port_lightning_checkpoint_roundtrip(tmp_path):
    import jax

    from mdgen_tpu.runtime import checkpoint as ckpt_io
    from mdgen_tpu.runtime.wrapper import MDGenRuntime
    from tools.port_checkpoint import port_lightning_checkpoint

    cfg = golden._tiny_cfg(sim_condition=True, ema=True)
    ref, _, expected_params = golden._make_pair(cfg, seed=3)

    # EMA weights must port as a distinct tree: offset them by a constant
    ema_sd = {k: v + 0.25 for k, v in ref.state_dict().items()}

    ns = dict(dataclasses.asdict(cfg))
    ns["precision"] = "16-mixed"  # Lightning string -> maps to bf16-mixed
    lightning_ckpt = {
        "state_dict": {f"model.{k}": v for k, v in ref.state_dict().items()},
        "ema": {"params": ema_sd, "decay": 0.999},
        "hyper_parameters": {"args": argparse.Namespace(**ns)},
        "global_step": 1234,
    }
    src = tmp_path / "ref.ckpt"
    torch.save(lightning_ckpt, src)

    out = tmp_path / "ported"
    path = port_lightning_checkpoint(str(src), str(out))
    assert os.path.basename(path) == "step_1234"

    # config round-trips, with the Lightning precision string normalized
    cfg2 = ckpt_io.load_config(str(out))
    assert cfg2 == cfg.replace(precision="bf16-mixed")

    # the standard inference load path: init a template state, restore into it
    rt = MDGenRuntime(cfg2)
    B, T, L = 1, cfg.num_frames, cfg.crop
    example = {
        "atom14": np.zeros((B, T, L, 14, 3), np.float32),
        "seqres": np.zeros((B, L), np.int32),
        "mask": np.ones((B, L), np.float32),
    }
    state = rt.init(jax.random.PRNGKey(0), example)
    restored, step = ckpt_io.load_checkpoint(str(out), state)
    assert step == 1234
    assert int(restored.step) == 1234

    flat_exp = jax.tree_util.tree_leaves_with_path(expected_params)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(restored.params))
    assert len(flat_exp) == len(flat_got)
    for key, leaf in flat_exp:
        np.testing.assert_allclose(
            np.asarray(flat_got[key]), np.asarray(leaf), rtol=0, atol=0,
            err_msg=str(key),
        )

    # EMA ported separately (constant offset survives the round trip), and
    # eval_params prefers it — the reference's load_ema_weights semantics
    ema_leaf = dict(jax.tree_util.tree_leaves_with_path(restored.ema_params))
    some_key = flat_exp[0][0]
    np.testing.assert_allclose(
        np.asarray(ema_leaf[some_key]),
        np.asarray(flat_got[some_key]) + 0.25,
        rtol=1e-6, atol=1e-6,
    )
    ev = dict(jax.tree_util.tree_leaves_with_path(rt.eval_params(restored)))
    np.testing.assert_allclose(
        np.asarray(ev[some_key]), np.asarray(ema_leaf[some_key]),
        rtol=0, atol=0,
    )


def test_port_checkpoint_requires_ema_entry(tmp_path):
    import dataclasses

    from tools.port_checkpoint import port_lightning_checkpoint

    cfg = golden._tiny_cfg(sim_condition=True, ema=True)
    ref, _, _ = golden._make_pair(cfg, seed=4)
    ckpt = {
        "state_dict": {f"model.{k}": v for k, v in ref.state_dict().items()},
        "hyper_parameters": {
            "args": argparse.Namespace(**dataclasses.asdict(cfg))
        },
        "global_step": 7,
    }
    src = tmp_path / "ref.ckpt"
    torch.save(ckpt, src)
    with pytest.raises(ValueError, match="ema"):
        port_lightning_checkpoint(str(src), str(tmp_path / "out"))

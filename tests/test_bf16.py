"""bf16-mixed precision: forward/training finite and close to f32."""
import jax
import jax.numpy as jnp
import numpy as np

from mdgen_tpu.runtime import MDGenRuntime
from tests.test_runtime import make_raw_batch, tiny_cfg


def test_bf16_forward_close_to_f32():
    cfg32 = tiny_cfg(ema=False)
    cfg16 = cfg32.replace(precision="bf16-mixed")
    rt32 = MDGenRuntime(cfg32)
    rt16 = MDGenRuntime(cfg16)
    batch = make_raw_batch(cfg32)

    state = rt32.init(jax.random.PRNGKey(0), batch)
    # same params work in both precisions (dtype only affects compute)
    a14_32, _ = rt32.inference(state.params, batch, jax.random.PRNGKey(5))
    a14_16, _ = rt16.inference(state.params, batch, jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(a14_16)).all()
    # coordinates in Angstroms: bf16 compute should stay within ~0.5 A here
    diff = np.abs(np.asarray(a14_32) - np.asarray(a14_16))
    assert diff.max() < 0.5, diff.max()


def test_bf16_training_step_finite():
    cfg = tiny_cfg(precision="bf16-mixed", ema=False)
    rt = MDGenRuntime(cfg)
    batch = make_raw_batch(cfg)
    state = rt.init(jax.random.PRNGKey(0), batch)
    state, metrics = rt.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params must remain f32
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.params)
    )

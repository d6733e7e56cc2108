"""mpnn / dynamic_mpnn task modes: model output contract + training loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgen_tpu.config import MDGenConfig
from mdgen_tpu.models import LatentMDGenModel
from mdgen_tpu.runtime import MDGenRuntime
from mdgen_tpu.tasks import prep_batch
from tests.test_model import make_batch, tiny_cfg
from tests.test_runtime import make_raw_batch


@pytest.mark.parametrize("mode", ["mpnn", "dynamic_mpnn"])
def test_mpnn_forward_returns_logits(mode, rng):
    kw = {mode: True, "design": True, "sim_condition": mode == "mpnn",
          "inpainting": mode == "dynamic_mpnn"}
    cfg = tiny_cfg(**kw)
    model = LatentMDGenModel(cfg, cfg.latent_dim)
    batch = make_batch(rng, cfg)
    prep = prep_batch(cfg, batch)
    B, T, L = 2, cfg.num_frames, cfg.crop
    x = jnp.asarray(rng.normal(size=(B, T, L, cfg.latent_dim)).astype(np.float32))
    t = jnp.ones((B,))
    params = model.init(jax.random.PRNGKey(0), x, t, **prep.model_kwargs)
    out = model.apply(params, x, t, **prep.model_kwargs)
    # mpnn variants return per-residue logits with a singleton frame axis
    assert out.shape == (B, 1, L, 20)
    assert np.isfinite(np.asarray(out)).all()


def test_mpnn_training_and_inference():
    cfg = dict(
        num_layers=2, embed_dim=32, mha_heads=4, ipa_heads=2, ipa_head_dim=4,
        ipa_qk=2, ipa_v=2, num_frames=6, crop=4, prepend_ipa=True,
        abs_pos_emb=True, abs_time_emb=True, batch_size=4,
    )
    cfg = MDGenConfig(sim_condition=True, mpnn=True, design=True, **cfg)
    rt = MDGenRuntime(cfg)
    batch = make_raw_batch(cfg)
    state = rt.init(jax.random.PRNGKey(0), batch)
    state, metrics = rt.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_discrete" in metrics

    atom14, aa_out = rt.inference(rt.eval_params(state), batch, jax.random.PRNGKey(2))
    assert atom14.shape == (4, cfg.num_frames, 4, 14, 3)
    assert aa_out.shape[-1] == 4
    assert np.isfinite(np.asarray(atom14)).all()

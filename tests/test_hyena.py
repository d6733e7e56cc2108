"""Hyena operator: fftconv golden parity vs reference + operator sanity."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgen_tpu.models.hyena import HyenaOperator, fftconv, positional_embedding

REF = "/root/reference"


def test_fftconv_matches_reference_math(rng):
    """Golden vs the reference's crop/normalization convention
    (reference `mdgen/model/standalone_hyena.py:15-26`)."""
    u = rng.normal(size=(2, 8, 16)).astype(np.float32)  # B, D, L
    k = rng.normal(size=(8, 16)).astype(np.float32)  # D, L
    D = rng.normal(size=(8,)).astype(np.float32)

    got = np.asarray(fftconv(jnp.asarray(u), jnp.asarray(k), jnp.asarray(D)))

    if os.path.isdir(os.path.join(REF, "mdgen")):
        import sys

        sys.path.insert(0, REF)
        import torch
        from mdgen.model.standalone_hyena import fftconv as ref_fftconv

        ref = ref_fftconv(
            torch.from_numpy(u), torch.from_numpy(k), torch.from_numpy(D)
        ).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-4)
    else:
        # independent check of the crop window: linear conv evaluated at
        # output positions L-1 .. 2L-2 of the zero-padded circular conv
        L = u.shape[-1]
        full = np.stack(
            [
                np.stack(
                    [np.convolve(u[b, d], k[d], mode="full") for d in range(8)]
                )
                for b in range(2)
            ]
        )
        expect = full[..., L - 1 : 2 * L - 1] + u * D[None, :, None]
        np.testing.assert_allclose(got, expect, atol=1e-4)


def test_positional_embedding_layout():
    z, t = positional_embedding(3, 16)
    assert z.shape == (1, 16, 3)
    np.testing.assert_allclose(z[0, :, 0], np.linspace(0, 1, 16), atol=1e-6)
    # real/imag parts of a unit complex exponential
    np.testing.assert_allclose(z[0, :, 1] ** 2 + z[0, :, 2] ** 2, 1.0, atol=1e-5)


def test_hyena_operator_shapes(rng):
    op = HyenaOperator(d_model=32, l_max=24, order=2, filter_order=16)
    x = jnp.asarray(rng.normal(size=(3, 24, 32)).astype(np.float32))
    params = op.init(jax.random.PRNGKey(0), x)
    y = op.apply(params, x)
    assert y.shape == (3, 24, 32)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "mdgen")), reason="reference absent"
)
def test_hyena_model_integration(rng):
    """LatentMDGenModel with hyena frame-axis mixing runs and is finite."""
    from mdgen_tpu.config import MDGenConfig
    from mdgen_tpu.models import LatentMDGenModel
    from mdgen_tpu.tasks import prep_batch
    from tests.test_model import make_batch, tiny_cfg

    cfg = tiny_cfg(hyena=True)
    model = LatentMDGenModel(cfg, cfg.latent_dim)
    batch = make_batch(rng, cfg)
    prep = prep_batch(cfg, batch)
    x = jnp.asarray(
        rng.normal(size=(2, cfg.num_frames, cfg.crop, cfg.latent_dim)).astype(
            np.float32
        )
    )
    t = jnp.full((2,), 0.4)
    params = model.init(jax.random.PRNGKey(0), x, t, **prep.model_kwargs)
    out = model.apply(params, x, t, **prep.model_kwargs)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

"""TPU-only: the fused residue-attention sublayer kernel on the real chip.

Skipped on CPU (conftest forces JAX_PLATFORMS=cpu, where fused_l_sublayer
takes the pure-JAX fallback — covered by test_fused_block.py). Run on the
real chip with:

    MDGEN_TPU_TESTS=1 python -m pytest tests/test_fused_block_tpu.py -q -p no:cacheprovider

Never run concurrently with another TPU process (single tunnel).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="fused sublayer Pallas kernel only runs on TPU",
)


@pytest.mark.parametrize("T,block_t", [(100, 64), (128, 64), (100, 128)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_sublayer_on_chip(T, block_t, dtype):
    from test_fused_block import _setup

    from mdgen_tpu.ops.fused_block import fused_l_sublayer

    x, sh, sc, g, mask, arrays, y_ref, H = _setup(
        T=T, L=4, C=384, H=16, dtype=dtype
    )
    y = fused_l_sublayer(
        x, sh, sc, g, mask, **arrays, num_heads=H,
        compute_dtype=dtype, block_t=block_t, interpret=False,
    )
    # both paths run their projections through default-precision (bf16) MXU
    # passes in this build; parity is bf16-rounding-scale even at f32
    tol = 2e-2 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=tol, atol=tol)


def test_model_forward_fused_on_chip():
    """Full tiny-model forward with fused_block=True compiles and matches
    the unfused forward on the real chip."""
    import test_fused_block as tfb

    tfb.test_model_forward_fused_matches_unfused(tol=5e-2)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_t_on_chip(dtype):
    from test_fused_block import _setup_t

    fn, x, sh, sc, g, mask, arrays, y_ref, H = _setup_t(
        T=100, L=4, C=384, H=16, dtype=dtype
    )
    y = fn(
        x, sh, sc, g, mask, **arrays, num_heads=H,
        compute_dtype=dtype, interpret=False,
    )
    tol = 2e-2 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_ffn_on_chip(dtype):
    from test_fused_block import _ffn_setup

    from mdgen_tpu.ops import fused_ffn_sublayer

    x, sh, sc, g, ws, y_ref = _ffn_setup(T=100, L=4, C=384, dtype=dtype)
    y = fused_ffn_sublayer(
        x, sh, sc, g, *ws, compute_dtype=dtype, block_t=64, interpret=False,
    )
    tol = 2e-2 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=tol, atol=tol)

"""TPU-only: the Pallas flash-attention kernel must match the reference math.

These tests are skipped on CPU (tests/conftest.py forces JAX_PLATFORMS=cpu,
where the dispatcher falls back to chunked attention). Run them on the real
chip with:

    JAX_PLATFORMS='' python -m pytest tests/test_flash_tpu.py -q -p no:cacheprovider

(or via scripts/tpu_flash_check.py, which also reports timings).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas flash kernel only runs on TPU",
)


def _dense_reference(q, k, v, bias):
    s = jnp.einsum("nqd,nkd->nqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s + bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("T", [1024, 1000])  # aligned + ragged (pad path)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_kernel_matches_dense(T, dtype):
    from mdgen_tpu.ops.flash_attention import _flash_attention_tpu, chunked_attention

    rng = np.random.default_rng(0)
    N, d = 8, 24  # batch*heads, head_dim
    q = jnp.asarray(rng.normal(size=(N, T, d)), dtype) * 0.3
    k = jnp.asarray(rng.normal(size=(N, T + 1, d)), dtype) * 0.3  # bias_kv token
    v = jnp.asarray(rng.normal(size=(N, T + 1, d)), dtype) * 0.3
    mask = np.ones((N, T + 1), np.float32)
    mask[:, T // 2 : T - 3] = 0.0  # a masked span
    bias = jnp.asarray(np.where(mask > 0, 0.0, np.finfo(np.float32).min))

    out = _flash_attention_tpu(q, k, v, bias)
    ref = _dense_reference(q, k, v, bias)
    chk = chunked_attention(q, k, v, bias)
    # this JAX build's MXU matmuls default to bf16 even for f32 inputs, on
    # both sides of the comparison -> agreement is bf16-scale, not f32-scale
    atol = 5e-4 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(chk, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_flash_engages_in_model_at_long_T():
    """At T? > 512 the 'auto'/'flash' dispatch must route to the Pallas
    kernel path and produce the same output as the dense computation."""
    from mdgen_tpu.models.attention import RoPEAttention

    rng = np.random.default_rng(1)
    B, T, L, C, H = 1, 1024, 4, 64, 4
    x = jnp.asarray(rng.normal(size=(B, T, L, C)), jnp.float32)
    mask = jnp.ones((B, T, L), jnp.float32)

    flash = RoPEAttention(C, H, impl="flash")
    dense = RoPEAttention(C, H, impl="dense")
    params = flash.init(jax.random.PRNGKey(0), x, mask, axis=1)
    out_f = flash.apply(params, x, mask, axis=1)
    out_d = dense.apply(params, x, mask, axis=1)
    # bf16-default MXU matmuls on both paths + an out_proj reduction:
    # agreement is ~3e-3; a real masking/indexing bug would be O(1)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_d), atol=5e-3
    )


@pytest.mark.parametrize("T", [1024, 1000])
def test_flash_vjp_matches_chunked_autodiff(T):
    """FA2 custom-vjp backward on-chip vs autodiff of the chunked-JAX path
    (the reference gradient at long T)."""
    from mdgen_tpu.ops.flash_attention import _flash_vjp, chunked_attention

    rng = np.random.default_rng(4)
    N, d = 8, 24
    q = jnp.asarray(rng.normal(size=(N, T, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(N, T + 1, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.normal(size=(N, T + 1, d)), jnp.float32) * 0.3
    mask = np.ones((N, T + 1), np.float32)
    mask[:, T // 2 : T - 3] = 0.0
    bias = jnp.asarray(np.where(mask > 0, 0.0, np.finfo(np.float32).min))
    w = jnp.asarray(rng.normal(size=(N, T, d)), jnp.float32)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, bias) * w)

    g_f = jax.grad(lambda *a: loss(_flash_vjp, *a), argnums=(0, 1, 2))(q, k, v)
    g_c = jax.grad(lambda *a: loss(chunked_attention, *a), argnums=(0, 1, 2))(
        q, k, v
    )
    for name, a, b in zip("qkv", g_f, g_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3,
            err_msg=f"on-chip grad mismatch for {name}",
        )

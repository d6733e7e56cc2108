"""Flash-attention backward (custom_vjp) parity, CPU interpret mode.

The Pallas kernels themselves run here under ``interpret=True``
(MDGEN_PALLAS_INTERPRET=1), so the kernel *math* — including the FA2
backward recomputation — is exercised without TPU hardware. On-chip
execution is covered by tests/test_flash_tpu.py.

Shapes are chosen to hit the multi-block loops AND the padding path
(Tq=300 -> bq=256, Tq_p=512; ragged Tk).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _dense(q, k, v, bias):
    s = jnp.einsum(
        "nqd,nkd->nqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) + bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.fixture()
def interp(monkeypatch):
    monkeypatch.setenv("MDGEN_PALLAS_INTERPRET", "1")


def _inputs(Tq=300, Tk=301, N=2, d=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(N, Tq, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(N, Tk, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.normal(size=(N, Tk, d)), jnp.float32) * 0.3
    mask = np.ones((N, Tk), np.float32)
    mask[:, Tk // 3 : Tk // 2] = 0.0
    bias = jnp.asarray(np.where(mask > 0, 0.0, np.finfo(np.float32).min))
    return q, k, v, bias


def test_fwd_lse_matches_dense(interp):
    from mdgen_tpu.ops.flash_attention import _flash_fwd_tpu

    q, k, v, bias = _inputs()
    o, lse = _flash_fwd_tpu(q, k, v, bias)
    ref = _dense(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)

    s = jnp.einsum("nqd,nkd->nqk", q, k) + bias[:, None, :]
    lse_ref = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=2e-5)


def test_vjp_matches_dense_autodiff(interp):
    from mdgen_tpu.ops.flash_attention import _flash_vjp

    q, k, v, bias = _inputs()
    w = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 300, 8)), jnp.float32
    )

    def loss_flash(q, k, v, bias):
        return jnp.sum(_flash_vjp(q, k, v, bias) * w)

    def loss_dense(q, k, v, bias):
        return jnp.sum(_dense(q, k, v, bias) * w)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g_f, g_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_vjp_single_block_and_bf16(interp):
    from mdgen_tpu.ops.flash_attention import _flash_vjp

    q, k, v, bias = _inputs(Tq=24, Tk=25, N=3, d=16, seed=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss(fn, *args):
        return jnp.sum(fn(*args).astype(jnp.float32) ** 2)

    g_f = jax.grad(lambda a, b, c: loss(_flash_vjp, a, b, c, bias),
                   argnums=(0, 1, 2))(qb, kb, vb)
    g_d = jax.grad(lambda a, b, c: loss(_dense, a, b, c, bias),
                   argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_f, g_d):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b), atol=0.05, rtol=0.05,
            err_msg=f"bf16 grad mismatch for {name}",
        )


def test_model_long_T_training_grad_uses_flash(interp):
    """RoPEAttention 'auto' at S_k > 512 routes to flash; its gradient must
    match the dense implementation's."""
    from mdgen_tpu.models.attention import RoPEAttention

    B, T, L, C, H = 1, 520, 2, 32, 4
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, T, L, C)), jnp.float32) * 0.2
    mask = jnp.ones((B, T, L), jnp.float32)

    def make(impl):
        return RoPEAttention(C, H, impl=impl, name="attn")

    params = make("dense").init(jax.random.PRNGKey(0), x, mask, axis=1)

    def loss(impl, p, x):
        out = make(impl).apply(p, x, mask, axis=1)
        return jnp.sum(out**2)

    g_auto = jax.grad(loss, argnums=2)("auto", params, x)
    g_dense = jax.grad(loss, argnums=2)("dense", params, x)
    np.testing.assert_allclose(
        np.asarray(g_auto), np.asarray(g_dense), atol=5e-4
    )

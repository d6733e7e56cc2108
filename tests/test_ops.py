"""Kernel correctness: chunked / flash attention vs dense reference."""
import jax
import jax.numpy as jnp
import numpy as np

from mdgen_tpu.ops import chunked_attention, flash_attention

NEG = float(jnp.finfo(jnp.float32).min)


def dense_reference(q, k, v, bias):
    s = jnp.einsum("nqd,nkd->nqk", q, k) + bias[:, None, :]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum("nqk,nkd->nqd", p, v.astype(jnp.float32)).astype(q.dtype)


def make_qkv(rng, N=4, Tq=70, Tk=70, d=24):
    q = jnp.asarray(rng.normal(size=(N, Tq, d)).astype(np.float32)) * d**-0.5
    k = jnp.asarray(rng.normal(size=(N, Tk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, Tk, d)).astype(np.float32))
    mask = rng.random((N, Tk)) > 0.2
    mask[:, 0] = True
    bias = jnp.where(jnp.asarray(mask), 0.0, NEG)
    return q, k, v, bias


def test_chunked_matches_dense(rng):
    q, k, v, bias = make_qkv(rng)
    ref = dense_reference(q, k, v, bias)
    out = chunked_attention(q, k, v, bias, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_chunked_non_divisible_lengths(rng):
    q, k, v, bias = make_qkv(rng, Tq=33, Tk=57)
    ref = dense_reference(q, k, v, bias)
    out = chunked_attention(q, k, v, bias, block_k=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_dispatcher_matches_dense(rng):
    # on CPU the dispatcher routes to chunked; on TPU it runs the Pallas
    # kernel — either way the contract must hold
    q, k, v, bias = make_qkv(rng, Tq=128, Tk=130)
    ref = dense_reference(q, k, v, bias)
    out = flash_attention(q, k, v, bias, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3)


def test_chunked_is_differentiable(rng):
    q, k, v, bias = make_qkv(rng, N=2, Tq=16, Tk=16, d=8)

    def loss(q):
        return jnp.sum(chunked_attention(q, k, v, bias, block_k=8) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one element
    eps = 1e-3
    dq = q.at[0, 0, 0].add(eps)
    fd = (loss(dq) - loss(q)) / eps
    np.testing.assert_allclose(float(fd), float(g[0, 0, 0]), rtol=0.05, atol=1e-2)


def test_axis_attention_equivalent_to_reshape_path(rng):
    """The 4D axis-aware attention must match folding the other axis into
    batch and using the 3D path, with identical parameters."""
    import flax
    from mdgen_tpu.models.attention import RoPEAttention

    B, T, L, C, H = 2, 6, 5, 32, 4
    attn = RoPEAttention(C, H, use_rope=True, add_bias_kv=True)
    x = jnp.asarray(rng.normal(size=(B, T, L, C)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, T, L)) > 0.2).astype(np.float32))
    mask = mask.at[:, :, 0].set(1.0)
    params = attn.init(jax.random.PRNGKey(0), x, mask, axis=1)

    for axis in (1, 2):
        out4d = attn.apply(params, x, mask, axis=axis)
        if axis == 1:
            x3 = jnp.swapaxes(x, 1, 2).reshape(B * L, T, C)
            m3 = jnp.swapaxes(mask, 1, 2).reshape(B * L, T)
            ref = attn.apply(params, x3, m3)
            ref = jnp.swapaxes(ref.reshape(B, L, T, C), 1, 2)
        else:
            x3 = x.reshape(B * T, L, C)
            m3 = mask.reshape(B * T, L)
            ref = attn.apply(params, x3, m3).reshape(B, T, L, C)
        np.testing.assert_allclose(
            np.asarray(out4d), np.asarray(ref), atol=3e-3
        )

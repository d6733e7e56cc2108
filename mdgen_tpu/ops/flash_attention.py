"""Memory-efficient attention for the factorized trajectory axes.

The frame-axis attention runs at (B*L, T, H, hd) with T up to 1000+: the
naive einsum materializes a [B*L, H, T, T] float32 logit tensor (gigabytes at
the 4AA training shape). Two O(T) alternatives:

  * :func:`flash_attention` — a Pallas TPU kernel with online softmax
    (Q blocks resident in VMEM, K/V streamed in blocks). Differentiable:
    a FlashAttention-2-style backward (dq kernel + dkv kernel, recomputing
    probabilities from the saved logsumexp) is wired in via
    ``jax.custom_vjp``, so long-T *training* also runs O(T) memory on TPU.
  * :func:`chunked_attention` — blockwise pure-JAX (lax.scan over key
    blocks) with the same math; differentiable via autodiff, used as the
    flash fallback on CPU.

Both take an additive key bias (mask encoded as 0 / -inf), matching the
softmax-in-f32 semantics of `models.attention.RoPEAttention`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _interpret() -> bool:
    """Run Pallas kernels in interpret mode (CPU testing of the kernel math
    itself; the production CPU path is chunked_attention)."""
    import os

    return os.environ.get("MDGEN_PALLAS_INTERPRET", "0") == "1"


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int):
    """One (batch*head, q_block) program: stream K/V blocks with online
    softmax. Ref block shapes: q/o [1, Tq, d], k/v [1, Tk, d],
    bias [1, 1, Tk] (kept 3D: Mosaic requires the trailing two block dims be
    (8, 128)-tiled or equal to the array dims)."""
    q = q_ref[0, :, :].astype(jnp.float32)
    Tq, d = q.shape
    Tk = k_ref.shape[1]

    m = jnp.full((Tq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((Tq, 1), jnp.float32)
    acc = jnp.zeros((Tq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b[None, :]

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        scale = jnp.exp(m - m_new)
        l_new = l * scale + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * scale + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, Tk // block_k, body, (m, l, acc))
    o_ref[0, :, :] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 256,
) -> jnp.ndarray:
    """Dispatcher: Pallas kernel on TPU, chunked-JAX elsewhere (Pallas CPU
    support is interpret-only). Differentiable on TPU via the custom-vjp
    backward kernels; block sizes reach both forward and backward."""
    if jax.default_backend() != "tpu" and not _interpret():
        return chunked_attention(q, k, v, bias, block_k=block_k)
    return _flash_vjp_blocked(block_q, block_k, q, k, v, bias)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_attention_tpu(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 256,
) -> jnp.ndarray:
    """q: [N, Tq, d] (pre-scaled), k/v: [N, Tk, d], bias: [N, Tk] additive
    (0 or -inf). Returns [N, Tq, d]. N is typically batch*heads."""
    N, Tq, d = q.shape
    Tk = k.shape[1]
    bq = min(block_q, max(Tq, 8))
    bk = min(block_k, max(Tk, 8))
    Tq_p = -(-Tq // bq) * bq
    Tk_p = -(-Tk // bk) * bk

    qp = _pad_to(q, Tq_p, 1)
    kp = _pad_to(k, Tk_p, 1)
    vp = _pad_to(v, Tk_p, 1)
    bp = _pad_to(bias, Tk_p, 1, value=_NEG_INF)[:, None, :]  # [N, 1, Tk_p]

    grid = (N, Tq_p // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, Tk_p, d), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, Tk_p, d), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Tk_p), lambda n, i: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda n, i: (n, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, Tq_p, d), q.dtype),
        interpret=_interpret(),
    )(qp, kp, vp, bp)
    return out[:, :Tq]


# ---------------------------------------------------------------------------
# Pallas flash attention backward (FlashAttention-2 recomputation scheme)
# ---------------------------------------------------------------------------


def _flash_fwd_lse_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                          *, block_k: int):
    """Forward that also writes the per-row logsumexp (m + log l), the only
    residual the FA2 backward needs beyond the inputs and the output."""
    q = q_ref[0, :, :].astype(jnp.float32)
    Tq, d = q.shape
    Tk = k_ref.shape[1]

    m = jnp.full((Tq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((Tq, 1), jnp.float32)
    acc = jnp.zeros((Tq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b[None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        scale = jnp.exp(m - m_new)
        l_new = l * scale + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * scale + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, Tk // block_k, body, (m, l, acc))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, :, :] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0, :] = (m + jnp.log(l_safe))[:, 0]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, *, block_k: int):
    """dq for one (batch*head, q_block) program: stream K/V blocks,
    recompute p = exp(s - lse), ds = p * (dO·Vᵀ - delta), dq = ds·K."""
    q = q_ref[0, :, :].astype(jnp.float32)
    do = do_ref[0, :, :].astype(jnp.float32)
    lse = lse_ref[0, 0, :][:, None]
    delta = delta_ref[0, 0, :][:, None]
    Tq, d = q.shape
    Tk = k_ref.shape[1]

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b[None, :]
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(
        0, Tk // block_k, body, jnp.zeros((Tq, d), jnp.float32)
    )
    dq_ref[0, :, :] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, db_ref, *, block_q: int):
    """dk/dv/dbias for one (batch*head, k_block) program: stream Q/dO blocks.
    dv = pᵀ·dO, dk = dsᵀ·Q, dbias = Σ_q ds."""
    k = k_ref[0, :, :].astype(jnp.float32)
    v = v_ref[0, :, :].astype(jnp.float32)
    b = bias_ref[0, 0, :].astype(jnp.float32)
    Tk, d = k.shape
    Tq = q_ref.shape[1]

    def body(i, carry):
        dk, dv, db = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b[None, :]
        p = jnp.exp(s - lse)  # [bq, Tk]
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_new, dv_new, db + jnp.sum(ds, axis=0)

    dk, dv, db = jax.lax.fori_loop(
        0, Tq // block_q, body,
        (jnp.zeros((Tk, d), jnp.float32), jnp.zeros((Tk, d), jnp.float32),
         jnp.zeros((Tk,), jnp.float32)),
    )
    dk_ref[0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, :, :] = dv.astype(dv_ref.dtype)
    db_ref[0, 0, :] = db.astype(db_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_fwd_tpu(q, k, v, bias, block_q: int = 256, block_k: int = 256):
    """Forward returning (o [N,Tq,d], lse [N,Tq] f32)."""
    N, Tq, d = q.shape
    Tk = k.shape[1]
    bq = min(block_q, max(Tq, 8))
    bk = min(block_k, max(Tk, 8))
    Tq_p = -(-Tq // bq) * bq
    Tk_p = -(-Tk // bk) * bk
    qp = _pad_to(q, Tq_p, 1)
    kp = _pad_to(k, Tk_p, 1)
    vp = _pad_to(v, Tk_p, 1)
    bp = _pad_to(bias, Tk_p, 1, value=_NEG_INF)[:, None, :]

    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_lse_kernel, block_k=bk),
        grid=(N, Tq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, Tk_p, d), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, Tk_p, d), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Tk_p), lambda n, i: (n, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda n, i: (n, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Tq_p, d), q.dtype),
            jax.ShapeDtypeStruct((N, 1, Tq_p), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, bp)
    return out[:, :Tq], lse[:, 0, :Tq]


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_bwd_tpu(q, k, v, bias, o, lse, do,
                   block_q: int = 256, block_k: int = 256):
    N, Tq, d = q.shape
    Tk = k.shape[1]
    bq = min(block_q, max(Tq, 8))
    bk = min(block_k, max(Tk, 8))
    Tq_p = -(-Tq // bq) * bq
    Tk_p = -(-Tk // bk) * bk

    # delta = rowsum(dO ⊙ O): cheap elementwise, let XLA fuse it
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    qp = _pad_to(q, Tq_p, 1)
    kp = _pad_to(k, Tk_p, 1)
    vp = _pad_to(v, Tk_p, 1)
    bp = _pad_to(bias, Tk_p, 1, value=_NEG_INF)[:, None, :]
    dop = _pad_to(do, Tq_p, 1)
    # padded q rows: lse = 0 would give p = exp(s); harmless because their
    # dO rows are zero-padded, so dp = delta = 0 and ds = 0
    lsep = _pad_to(lse, Tq_p, 1)[:, None, :]
    deltap = _pad_to(delta, Tq_p, 1)[:, None, :]

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=bk),
        grid=(N, Tq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, Tk_p, d), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, Tk_p, d), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Tk_p), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, bq, d), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda n, i: (n, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda n, i: (n, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda n, i: (n, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, Tq_p, d), q.dtype),
        interpret=_interpret(),
    )(qp, kp, vp, bp, dop, lsep, deltap)

    dk, dv, db = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=bq),
        grid=(N, Tk_p // bk),
        in_specs=[
            pl.BlockSpec((1, Tq_p, d), lambda n, j: (n, 0, 0)),
            pl.BlockSpec((1, bk, d), lambda n, j: (n, j, 0)),
            pl.BlockSpec((1, bk, d), lambda n, j: (n, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda n, j: (n, 0, j)),
            pl.BlockSpec((1, Tq_p, d), lambda n, j: (n, 0, 0)),
            pl.BlockSpec((1, 1, Tq_p), lambda n, j: (n, 0, 0)),
            pl.BlockSpec((1, 1, Tq_p), lambda n, j: (n, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda n, j: (n, j, 0)),
            pl.BlockSpec((1, bk, d), lambda n, j: (n, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda n, j: (n, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Tk_p, d), k.dtype),
            jax.ShapeDtypeStruct((N, Tk_p, d), v.dtype),
            jax.ShapeDtypeStruct((N, 1, Tk_p), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, bp, dop, lsep, deltap)

    return (dq[:, :Tq], dk[:, :Tk], dv[:, :Tk],
            db[:, 0, :Tk].astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flash_vjp_blocked(block_q, block_k, q, k, v, bias):
    return _flash_attention_tpu(q, k, v, bias, block_q=block_q, block_k=block_k)


def _flash_vjp_fwd(block_q, block_k, q, k, v, bias):
    o, lse = _flash_fwd_tpu(q, k, v, bias, block_q=block_q, block_k=block_k)
    return o, (q, k, v, bias, o, lse)


def _flash_vjp_bwd(block_q, block_k, res, do):
    q, k, v, bias, o, lse = res
    return _flash_bwd_tpu(q, k, v, bias, o, lse, do,
                          block_q=block_q, block_k=block_k)


_flash_vjp_blocked.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)

# default-block convenience (tests, direct callers)
_flash_vjp = functools.partial(_flash_vjp_blocked, 256, 256)


# ---------------------------------------------------------------------------
# Blockwise pure-JAX attention (differentiable fallback)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block_k",))
def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    block_k: int = 256,
) -> jnp.ndarray:
    """Same contract as :func:`flash_attention`, lax.scan over key blocks
    with online softmax. O(Tq * block_k) live memory; differentiable."""
    N, Tq, d = q.shape
    Tk = k.shape[1]
    bk = min(block_k, Tk)
    Tk_p = -(-Tk // bk) * bk
    kp = _pad_to(k, Tk_p, 1)
    vp = _pad_to(v, Tk_p, 1)
    bp = _pad_to(bias, Tk_p, 1, value=_NEG_INF)

    kb = kp.reshape(N, Tk_p // bk, bk, d).swapaxes(0, 1)
    vb = vp.reshape(N, Tk_p // bk, bk, d).swapaxes(0, 1)
    bb = bp.reshape(N, Tk_p // bk, bk).swapaxes(0, 1)

    qf = q.astype(jnp.float32)

    def body(carry, blk):
        m, l, acc = carry
        kblk, vblk, bblk = blk
        s = jnp.einsum(
            "nqd,nkd->nqk", qf, kblk.astype(jnp.float32)
        ) + bblk[:, None, :].astype(jnp.float32)
        m_new = jnp.maximum(m, s.max(-1, keepdims=True))
        p = jnp.exp(s - m_new)
        scale = jnp.exp(m - m_new)
        l_new = l * scale + p.sum(-1, keepdims=True)
        acc_new = acc * scale + jnp.einsum(
            "nqk,nkd->nqd", p, vblk.astype(jnp.float32)
        )
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((N, Tq, 1), _NEG_INF, jnp.float32),
        jnp.zeros((N, Tq, 1), jnp.float32),
        jnp.zeros((N, Tq, d), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, (kb, vb, bb))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)

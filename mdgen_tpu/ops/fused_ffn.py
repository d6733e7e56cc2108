"""Fused MLP sublayer (Pallas TPU kernel).

One kernel per trunk layer replaces the LN -> adaLN-modulate -> fc1 ->
gelu -> fc2 -> gated residual chain (reference semantics:
`mdgen/model/latent_model.py:468-472`). Rowwise over (B, T) like
ops/fused_block.py — every intermediate (including the [rows, L, 4C]
hidden) stays in VMEM; HBM sees one read of x and one write of y.

Same Mosaic rules as the attention kernel: f32 intermediates (no stored
bf16), `dt` only selects the projection matmul operand dtype, no
reshapes/concats/slices in-kernel. Forward-only (serving); training keeps
the module graph.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _interpret


def _erf_f32(z):
    """f32 erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7).

    Mosaic has no lowering for the `erf` primitive (KernelType.TC), so the
    kernel composes it from exp/abs/where, which it does support. Used in
    the CPU fallback too so every fused path computes identical math; the
    approximation error is ~100x below the fused-vs-module parity
    tolerance (2e-5)."""
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(z < 0.0, -e, e)


def _ffn_math(x, shift, scale, gate, w1, b1, w2, b2, *, dt):
    f32 = jnp.float32
    xf = x.astype(f32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    h = ln * (1.0 + scale.astype(f32)) + shift.astype(f32)

    h1 = jnp.einsum(
        "rlc,cd->rld", h.astype(dt), w1.astype(dt),
        preferred_element_type=f32,
    ) + b1.astype(f32)
    # exact (erf) gelu — parity with models/layers.py::gelu
    h1 = 0.5 * h1 * (1.0 + _erf_f32(h1 * (2.0 ** -0.5)))
    o = jnp.einsum(
        "rld,dc->rlc", h1.astype(dt), w2.astype(dt),
        preferred_element_type=f32,
    ) + b2.astype(f32)
    return (xf + gate.astype(f32) * o).astype(x.dtype)


def _ffn_kernel(x_ref, sh_ref, sc_ref, g_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, o_ref, *, dt):
    o_ref[0] = _ffn_math(
        x_ref[0], sh_ref[0], sc_ref[0], g_ref[0],
        w1_ref[...], b1_ref[0], w2_ref[...], b2_ref[0], dt=dt,
    )


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "block_t", "interpret")
)
def fused_ffn_sublayer(
    x, shift, scale, gate, w1, b1, w2, b2,
    *, compute_dtype=jnp.bfloat16, block_t: int = 64, interpret=None,
):
    """y = x + gate * fc2(gelu(fc1(modulate(LN(x), shift, scale)))).

    x: [B, T, L, C]; shift/scale/gate: [B, 1, C]; w1 [C, H], b1 [H],
    w2 [H, C], b2 [C]. Forward-only.
    """
    B, T, L, C = x.shape
    H = w1.shape[1]
    dt = jnp.dtype(compute_dtype)

    if interpret is None:
        interpret = _interpret()
    if jax.default_backend() != "tpu" and not interpret:
        return jax.vmap(
            lambda xb, sh, sc, g: _ffn_math(
                xb, sh, sc, g, w1, b1[None], w2, b2[None], dt=dt
            )
        )(x, shift, scale, gate)

    bt = min(block_t, T)
    grid = (B, pl.cdiv(T, bt))
    return pl.pallas_call(
        functools.partial(_ffn_kernel, dt=dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, L, C), lambda b, t: (b, t, 0, 0)),  # x
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),         # shift
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),         # scale
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),         # gate
            pl.BlockSpec((C, H), lambda b, t: (0, 0)),               # w1
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),               # b1
            pl.BlockSpec((H, C), lambda b, t: (0, 0)),               # w2
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),               # b2
        ],
        out_specs=pl.BlockSpec((1, bt, L, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, shift, scale, gate, w1, b1[None], w2, b2[None])

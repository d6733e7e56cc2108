"""Fused frame-attention (T-axis) sublayer (Pallas TPU kernel).

One kernel per trunk layer replaces the serving chain
LN -> adaLN-modulate -> fused-qkv matmul -> RoPE -> T-attention
(softmax over T+1 keys incl. the learned bias token) -> out-proj ->
gated residual add (reference semantics: `mdgen/model/latent_model.py:
464-476` + `mdgen/model/mha.py:265-388`), completing the per-layer fusion
story started by ops/fused_block.py (L-attention) and ops/fused_ffn.py.

Why this shape: the round-2 trace showed the dense T-attention's
head-split layout copies (bf16[B,T,L,H,hd] transposes) costing ~0.45 ms
per denoiser step at B=8 — pure HBM round-trips. Here every intermediate
stays in VMEM: the grid is (B, L), one program per residue, so frame
attention needs no in-kernel reshapes or slices at all:

  * RoPE's rotate_half is applied full-width as a constant signed
    permutation matmul R [C, C] (HIGHEST — exact, see fused_block.py).
  * per-head logits: s_h = q @ (k * E_h)^T via dot_general contracting
    the full channel axis; E_h zero-masks the other heads' channels, so
    the sum equals the per-head hd-contraction exactly. No [T, H, hd]
    re-tiling (Mosaic cannot split a 384-lane axis into (16, 24)).
  * prob -> value mixing: num += p_h @ (v * E_h) lands each head's
    output in its own channels; the per-head normalizer broadcasts back
    to channel width through E_h.
  * the learned bias token (key position T) is folded in analytically:
    its roped, head-masked key matrix kbE = E * rope(k_bias) [C, H] is
    precomputed OUTSIDE the kernel, giving all heads' bias logits in one
    [T, C] x [C, H] matmul.

The extra FLOPs (C-wide instead of hd-wide logit/mixing contractions:
H x T^2 x C per residue) are ~25 us/step at the 4AA serving shape —
noise next to the HBM copies they remove. Gate at small L: at L >= 16
the lane dimension is no longer starved and XLA's dense path is already
MXU-efficient (the model applies this gate).

Differentiability: forward-only (sampling path). Training keeps the
unfused module graph (the Pallas flash kernel covers long-T training).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _interpret
from .fused_block import (
    _head_selector,
    _rope_tables_full,
    _rotation_matrix,
)

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _t_sublayer_math(
    x, shift, scale, gate, mk, qkv_w, qkv_b, out_w, out_b,
    sin_t, cos_t, kbE, vb, R, E_exp, *, H: int, use_rope: bool, dt,
):
    """One residue's fused math: x [T, C], shift/scale/gate [1, C],
    mk [1, 1] (this residue's key validity), sin_t/cos_t [T, C] (tiled
    per-head RoPE tables), kbE [C, H] (roped bias key, head-masked),
    vb [1, C] (bias value), R [C, C], E_exp [H, 1, C]. Mosaic-legal:
    no reshapes, slices, or concats except leading-dim indexing."""
    T, C = x.shape
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST

    xf = x.astype(f32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    h = ln * (1.0 + scale.astype(f32)) + shift.astype(f32)  # [T, C]

    # fused qkv at DEFAULT matmul precision (this build's default is bf16
    # MXU passes, same as the unfused module's Dense layers — parity is
    # within bf16 rounding, the on-chip test tolerance)
    qkv = jnp.dot(
        h.astype(dt), qkv_w.astype(dt), preferred_element_type=f32
    ) + qkv_b.astype(f32)  # [T, 3C]
    q = qkv[:, :C] * ((C // H) ** -0.5)
    k = qkv[:, C : 2 * C]
    v = qkv[:, 2 * C :]

    if use_rope:
        # R is a signed permutation: HIGHEST keeps f32 operands so the
        # rotation is exactly rotate_half (default-bf16 passes would
        # inject ~1e-2, see fused_block.py)
        q = q * cos_t + jnp.dot(
            q, R, precision=hi, preferred_element_type=f32
        ) * sin_t
        k = k * cos_t + jnp.dot(
            k, R, precision=hi, preferred_element_type=f32
        ) * sin_t

    # all heads' bias-token logits in one matmul (kbE pre-roped outside)
    lb_all = jnp.dot(
        q.astype(dt), kbE.astype(dt), preferred_element_type=f32
    )  # [T, H]
    head_iota = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)

    num = jnp.zeros((T, C), f32)
    zfull = jnp.zeros((T, C), f32)
    for hh in range(H):
        Eh = E_exp[hh].astype(f32)  # [1, C]
        kh = k * Eh
        s = jax.lax.dot_general(
            q.astype(dt), kh.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [T, T]
        s = jnp.where(mk > 0, s, _NEG_INF)  # frame-constant residue mask
        lb = jnp.sum(
            lb_all * (head_iota == hh).astype(f32), axis=-1, keepdims=True
        )  # [T, 1]
        m = jnp.maximum(s.max(axis=-1, keepdims=True), lb)
        p = jnp.exp(s - m)
        pb = jnp.exp(lb - m)
        z = p.sum(axis=-1, keepdims=True) + pb  # [T, 1]
        num = num + jax.lax.dot_general(
            p.astype(dt), (v * Eh).astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + pb * (vb.astype(f32) * Eh)
        zfull = zfull + z * Eh
    out = num / zfull  # [T, C]

    o = jnp.dot(
        out.astype(dt), out_w.astype(dt), preferred_element_type=f32
    ) + out_b.astype(f32)
    return (xf + gate.astype(f32) * o).astype(x.dtype)


def _fused_t_kernel(
    x_ref, sh_ref, sc_ref, g_ref, m_ref, qkvw_ref, qkvb_ref, ow_ref, ob_ref,
    sin_ref, cos_ref, kbE_ref, vb_ref, R_ref, E_ref, o_ref,
    *, H: int, use_rope: bool, dt,
):
    o_ref[0, 0] = _t_sublayer_math(
        x_ref[0, 0], sh_ref[0], sc_ref[0], g_ref[0], m_ref[0, 0],
        qkvw_ref[...], qkvb_ref[0], ow_ref[...], ob_ref[0],
        sin_ref[...], cos_ref[...], kbE_ref[...], vb_ref[0][None],
        R_ref[...], E_ref[...], H=H, use_rope=use_rope, dt=dt,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "use_rope", "compute_dtype", "interpret"),
)
def fused_t_sublayer(
    x, shift, scale, gate, mask,
    qkv_w, qkv_b, bias_k, bias_v, out_w, out_b,
    *, num_heads: int, use_rope: bool = True,
    compute_dtype=jnp.bfloat16, interpret=None,
):
    """y = x + gate * out_proj(T_attention(modulate(LN(x), shift, scale))).

    x: [B, T, L, C]; shift/scale/gate: [B, 1, C] (adaLN chunks); mask:
    [B, L] (1 = valid; frame-constant residue mask — a masked residue's
    frame keys are all invalid, so its queries collapse onto the always-
    attendable bias token, matching the unfused module); qkv_w [C, 3C],
    qkv_b [3C], bias_k/bias_v [C], out_w [C, C], out_b [C]. Forward-only.
    """
    B, T, L, C = x.shape
    H = num_heads
    hd = C // H
    dt = jnp.dtype(compute_dtype)
    S = T + 1  # bias token at position T

    if use_rope:
        sin_t, cos_t = _rope_tables_full(S, C, H)
        # rope the bias key at position S-1 OUTSIDE the kernel (free to
        # reshape here): full-width rotate_half == per-head rotate
        kb = bias_k.reshape(H, hd)
        kb_rot = jnp.concatenate([-kb[:, hd // 2 :], kb[:, : hd // 2]], -1)
        kb_roped = (
            bias_k * cos_t[S - 1] + kb_rot.reshape(-1) * sin_t[S - 1]
        )
    else:
        sin_t = jnp.zeros((S, C), jnp.float32)
        cos_t = jnp.ones((S, C), jnp.float32)
        kb_roped = bias_k
    E = jnp.asarray(_head_selector(C, H))  # [C, H]
    kbE = E * kb_roped[:, None]  # [C, H]: head-masked roped bias key
    R = jnp.asarray(_rotation_matrix(C, H))
    E_exp = jnp.swapaxes(E, 0, 1)[:, None, :]  # [H, 1, C]
    mask = mask.astype(jnp.float32)

    if interpret is None:
        interpret = _interpret()
    if jax.default_backend() != "tpu" and not interpret:
        return _fallback(
            x, shift, scale, gate, mask, qkv_w, qkv_b, out_w, out_b,
            sin_t[:T], cos_t[:T], kbE, bias_v, R, E_exp,
            H=H, use_rope=use_rope, dt=dt,
        )

    xT = jnp.swapaxes(x, 1, 2)  # [B, L, T, C]: frame axis on sublanes
    grid = (B, L)
    yT = pl.pallas_call(
        functools.partial(_fused_t_kernel, H=H, use_rope=use_rope, dt=dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, T, C), lambda b, l: (b, l, 0, 0)),  # xT
            pl.BlockSpec((1, 1, C), lambda b, l: (b, 0, 0)),        # shift
            pl.BlockSpec((1, 1, C), lambda b, l: (b, 0, 0)),        # scale
            pl.BlockSpec((1, 1, C), lambda b, l: (b, 0, 0)),        # gate
            # [B, L, 1, 1] so each (b, l) program gets its own (1, 1)
            # block — the trailing two block dims equal the array dims,
            # satisfying Mosaic's divisibility rule at any B, L
            pl.BlockSpec((1, 1, 1, 1), lambda b, l: (b, l, 0, 0)),  # mask
            pl.BlockSpec((C, 3 * C), lambda b, l: (0, 0)),          # qkv_w
            pl.BlockSpec((1, 3 * C), lambda b, l: (0, 0)),          # qkv_b
            pl.BlockSpec((C, C), lambda b, l: (0, 0)),              # out_w
            pl.BlockSpec((1, C), lambda b, l: (0, 0)),              # out_b
            pl.BlockSpec((T, C), lambda b, l: (0, 0)),              # sin_t
            pl.BlockSpec((T, C), lambda b, l: (0, 0)),              # cos_t
            pl.BlockSpec((C, H), lambda b, l: (0, 0)),              # kbE
            pl.BlockSpec((1, C), lambda b, l: (0, 0)),              # vb
            pl.BlockSpec((C, C), lambda b, l: (0, 0)),              # R
            pl.BlockSpec((H, 1, C), lambda b, l: (0, 0, 0)),        # E_exp
        ],
        out_specs=pl.BlockSpec((1, 1, T, C), lambda b, l: (b, l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xT.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        xT, shift, scale, gate, mask[:, :, None, None],
        qkv_w, qkv_b[None], out_w, out_b[None],
        sin_t[:T], cos_t[:T], kbE, bias_v[None], R, E_exp,
    )
    return jnp.swapaxes(yT, 1, 2)


def _fallback(
    x, shift, scale, gate, mask, qkv_w, qkv_b, out_w, out_b,
    sin_t, cos_t, kbE, bias_v, R, E_exp, *, H, use_rope, dt,
):
    """vmap the per-residue math over (B, L) (pure JAX, any backend)."""
    fn = functools.partial(
        _t_sublayer_math, qkv_w=qkv_w, qkv_b=qkv_b[None], out_w=out_w,
        out_b=out_b[None], sin_t=sin_t, cos_t=cos_t, kbE=kbE,
        vb=bias_v[None], R=R, E_exp=E_exp, H=H, use_rope=use_rope, dt=dt,
    )
    xT = jnp.swapaxes(x, 1, 2)  # [B, L, T, C]

    def per_batch(xb, sh, sc, g, mb):
        return jax.vmap(
            lambda xl, ml: fn(xl, sh, sc, g, ml[None, None])
        )(xb, mb)

    yT = jax.vmap(per_batch)(xT, shift, scale, gate, mask)
    return jnp.swapaxes(yT, 1, 2)

"""Fused residue-attention sublayer (Pallas TPU kernel).

One kernel per trunk layer replaces the ~10-kernel chain
LN -> adaLN-modulate -> fused-qkv matmul -> RoPE -> L-attention
(softmax over L+1 keys incl. the learned bias token) -> out-proj ->
gated residual add (reference semantics: `mdgen/model/latent_model.py:
456-466` + `mdgen/model/mha.py:265-388`). Every intermediate stays in
VMEM; HBM sees exactly one read of x and one write of y per layer.

Why this shape: at peptide crops (L=4) the residue-attention tensors are
lane-starved — XLA's softmax fusion tiles f32[B,T,H,L,S] with S=5 live
lanes out of 128 (96% waste, measured in the round-2 trace). The fusion
here never materializes head-split tensors in HBM *and* keeps all in-kernel
operands full-width [rows, C] (C = 3 full lane tiles):

  * RoPE's rotate_half is a fixed per-head lane permutation+sign — applied
    as a [C, C] matmul with a constant rotation matrix R (MXU, no lane
    reshape; Mosaic cannot re-tile a 384-lane axis into (16, 24)).
  * per-head logit reduction sum_{d in head h} q_i[d] k_j[d] is a matmul
    of the elementwise product with a constant [C, H] head-selector E.
  * prob -> value mixing expands [.., H] probs back to [.., C] via E^T.

The extra FLOPs (rows x C x C rotations, rows*L*S x C x H selections) are
noise next to the qkv/out projections and buy fully static, Mosaic-legal
layouts.

Differentiability: forward-only (sampling path). Training keeps the
unfused module graph.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _interpret

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _rotation_matrix(C: int, H: int) -> np.ndarray:
    """R such that x @ R == per-head rotate_half(x) for full-width x.

    rotate_half on a head's [hd] slice maps (x1, x2) -> (-x2, x1); as a
    lane permutation with signs it is a (sparse) [C, C] matrix.
    """
    hd = C // H
    half = hd // 2
    R = np.zeros((C, C), np.float32)
    for h in range(H):
        o = h * hd
        for i in range(half):
            # out[o+i] = -x[o+half+i]; out[o+half+i] = x[o+i]
            R[o + half + i, o + i] = -1.0
            R[o + i, o + half + i] = 1.0
    return R


def _head_selector(C: int, H: int) -> np.ndarray:
    """E [C, H]: E[c, h] = 1 iff channel c belongs to head h."""
    hd = C // H
    E = np.zeros((C, H), np.float32)
    for h in range(H):
        E[h * hd : (h + 1) * hd, h] = 1.0
    return E


def _rope_tables_full(S: int, C: int, H: int):
    """ESM rotary sin/cos tables tiled to full width [S, C] (each head gets
    the same [S, hd] table — RoPE is per-head)."""
    from ..models.attention import rotary_tables

    hd = C // H
    sin, cos = rotary_tables(S, hd)  # [S, hd] f32
    sin = jnp.tile(sin, (1, H))
    cos = jnp.tile(cos, (1, H))
    return sin, cos


def _sublayer_math(
    x, shift, scale, gate, mask, qkv_w, qkv_b, bias_k, bias_v, out_w, out_b,
    sin_q, cos_q, sin_b, cos_b, R, E, *, H: int, use_rope: bool, dt,
):
    """The fused math on one [rows, L, C] block (shared by the Pallas kernel
    body and the pure-JAX fallback; everything here is Mosaic-legal)."""
    rows, L, C = x.shape
    S = L + 1
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST

    # Everything lives in f32 vector registers/VMEM; `dt` only selects the
    # operand dtype of the two big projection matmuls (matching the unfused
    # module, whose Dense layers cast inputs to the compute dtype). Stored
    # bf16 intermediates buy nothing on-chip and their packed (16, 128)
    # tiles hit Mosaic relayout/shape-cast limits at these tiny sublanes.
    xf = x.astype(f32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    h = ln * (1.0 + scale.astype(f32)) + shift.astype(f32)  # [rows, L, C]

    # Projections keep DEFAULT matmul precision: this build's default is
    # bf16 MXU passes (CLAUDE.md), same as the unfused module's Dense
    # layers, so parity is within bf16 rounding (~1e-2) — the on-chip test
    # tolerance reflects that. HIGHEST here trips Mosaic (scoped-vmem OOM
    # from the multi-pass temporaries; "Bad lhs type" for bf16 operands).
    qkv = jnp.einsum(
        "rlc,cd->rld", h.astype(dt), qkv_w.astype(dt),
        preferred_element_type=f32,
    ) + qkv_b.astype(f32)  # [rows, L, 3C] f32
    q = qkv[..., :C] * ((C // H) ** -0.5)
    k = qkv[..., C : 2 * C]
    v = qkv[..., 2 * C :]

    # The learned bias token (key S-1) is handled ANALYTICALLY below rather
    # than concatenated onto k/v: Mosaic rejects sublane-axis concats for
    # most block row counts ("result/input offset mismatch").
    kb = bias_k.astype(f32)  # [1, C]
    vb = bias_v.astype(f32)  # [1, C]

    if use_rope:
        # q/k tables are pre-sliced outside the kernel ([L, C] vs [S, C]):
        # an in-kernel [:L] slice lowers to a gather Mosaic rejects. The
        # rotation matmul is exact (HIGHEST): R is a signed permutation, so
        # default-bf16 MXU passes would inject ~1e-2 error vs rotate_half.
        q = q * cos_q[None] + jnp.einsum(
            "rlc,cd->rld", q, R, precision=hi, preferred_element_type=f32
        ) * sin_q[None]
        # real keys share q's position tables (rows 0..L-1); the bias
        # token's row S-1 arrives pre-sliced as sin_b/cos_b — in-kernel
        # table slices lower to gathers Mosaic rejects
        k = k * cos_q[None] + jnp.einsum(
            "rlc,cd->rld", k, R, precision=hi, preferred_element_type=f32
        ) * sin_q[None]
        kb = kb * cos_b + jnp.einsum(
            "xc,cd->xd", kb, R, precision=hi, preferred_element_type=f32
        ) * sin_b  # bias token sits at position S-1

    # per-head logits via full-width product + head-selector matmul (E is
    # 0/1: HIGHEST keeps the reduction exact in f32)
    t = q[:, :, None, :] * k[:, None, :, :]
    logits = jnp.einsum(
        "rqsc,ch->rqsh", t, E, precision=hi, preferred_element_type=f32
    )  # [rows, L, L, H] over the real keys
    logits = jnp.where(mask[None, None, :, None] > 0, logits, _NEG_INF)
    # bias-token logits: q . kb reduced per head = q @ (E * kb^T)
    logit_b = jnp.einsum(
        "rlc,ch->rlh", q, E * kb.T, precision=hi,
        preferred_element_type=f32,
    )  # [rows, L, H]; always attendable

    m = jnp.maximum(logits.max(axis=2), logit_b)  # [rows, L, H]
    p = jnp.exp(logits - m[:, :, None])  # [rows, L, L, H]
    p_b = jnp.exp(logit_b - m)  # [rows, L, H]
    z = p.sum(axis=2) + p_b  # [rows, L, H]

    pfull = jnp.einsum(
        "rqsh,ch->rqsc", p, E, precision=hi, preferred_element_type=f32
    )  # expand probs to channel width
    num = (pfull * v[:, None, :, :]).sum(axis=2)  # [rows, L, C]
    num = num + jnp.einsum(
        "rlh,ch->rlc", p_b, E, precision=hi, preferred_element_type=f32
    ) * vb[None]
    zfull = jnp.einsum(
        "rlh,ch->rlc", z, E, precision=hi, preferred_element_type=f32
    )
    out = num / zfull  # [rows, L, C]

    o = jnp.einsum(
        "rlc,cd->rld", out.astype(dt), out_w.astype(dt),
        preferred_element_type=f32,
    ) + out_b.astype(f32)
    return (xf + gate.astype(f32) * o).astype(x.dtype)


def _fused_kernel(
    x_ref, sh_ref, sc_ref, g_ref, m_ref, qkvw_ref, qkvb_ref, bk_ref, bv_ref,
    ow_ref, ob_ref, sinq_ref, cosq_ref, sinb_ref, cosb_ref, R_ref, E_ref,
    o_ref, *, H: int, use_rope: bool, dt,
):
    o_ref[0] = _sublayer_math(
        x_ref[0], sh_ref[0], sc_ref[0], g_ref[0], m_ref[0, 0],
        qkvw_ref[...], qkvb_ref[0], bk_ref[0][None], bv_ref[0][None],
        ow_ref[...], ob_ref[0], sinq_ref[...], cosq_ref[...],
        sinb_ref[...], cosb_ref[...],
        R_ref[...], E_ref[...], H=H, use_rope=use_rope, dt=dt,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "use_rope", "compute_dtype", "block_t", "interpret"
    ),
)
def fused_l_sublayer(
    x, shift, scale, gate, mask,
    qkv_w, qkv_b, bias_k, bias_v, out_w, out_b,
    *, num_heads: int, use_rope: bool = True,
    compute_dtype=jnp.bfloat16, block_t: int = 64, interpret=None,
):
    """y = x + gate * out_proj(L_attention(modulate(LN(x), shift, scale))).

    x: [B, T, L, C]; shift/scale/gate: [B, 1, C] (adaLN chunks); mask: [B, L]
    (1 = valid key; the learned bias token is always attendable);
    qkv_w [C, 3C], qkv_b [3C], bias_k/bias_v [C], out_w [C, C], out_b [C].
    Forward-only.
    """
    B, T, L, C = x.shape
    H = num_heads
    dt = jnp.dtype(compute_dtype)
    S = L + 1

    sin_t, cos_t = (
        _rope_tables_full(S, C, H) if use_rope
        else (jnp.zeros((S, C)), jnp.ones((S, C)))
    )
    R = jnp.asarray(_rotation_matrix(C, H))
    E = jnp.asarray(_head_selector(C, H))
    mask = mask.astype(jnp.float32)

    if interpret is None:
        interpret = _interpret()
    if jax.default_backend() != "tpu" and not interpret:
        # pure-JAX path (CPU production fallback, same math)
        return _fallback(
            x, shift, scale, gate, mask, qkv_w, qkv_b, bias_k, bias_v,
            out_w, out_b, sin_t, cos_t, R, E, H=H, use_rope=use_rope, dt=dt,
        )

    bt = min(block_t, T)
    grid = (B, pl.cdiv(T, bt))

    return pl.pallas_call(
        functools.partial(_fused_kernel, H=H, use_rope=use_rope, dt=dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, L, C), lambda b, t: (b, t, 0, 0)),      # x
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),             # shift
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),             # scale
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),             # gate
            # [B, 1, L]: Mosaic requires the trailing two block dims to be
            # (8,128)-divisible OR equal to the array dims; (1, L) over a
            # [B, L] array fails the sublane rule at B > 1
            pl.BlockSpec((1, 1, L), lambda b, t: (b, 0, 0)),             # mask
            pl.BlockSpec((C, 3 * C), lambda b, t: (0, 0)),               # qkv_w
            pl.BlockSpec((1, 3 * C), lambda b, t: (0, 0)),               # qkv_b
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),                   # bias_k
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),                   # bias_v
            pl.BlockSpec((C, C), lambda b, t: (0, 0)),                   # out_w
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),                   # out_b
            pl.BlockSpec((L, C), lambda b, t: (0, 0)),                   # sin_q
            pl.BlockSpec((L, C), lambda b, t: (0, 0)),                   # cos_q
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),                   # sin_b
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),                   # cos_b
            pl.BlockSpec((C, C), lambda b, t: (0, 0)),                   # R
            pl.BlockSpec((C, H), lambda b, t: (0, 0)),                   # E
        ],
        out_specs=pl.BlockSpec((1, bt, L, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # f32 temporaries at large block_t exceed the default 16M scoped
        # vmem budget (measured 19.5M at bt=100); v5e has 128M VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, shift, scale, gate, mask[:, None], qkv_w, qkv_b[None],
        bias_k[None], bias_v[None], out_w, out_b[None],
        sin_t[:L], cos_t[:L], sin_t[S - 1 :], cos_t[S - 1 :], R, E,
    )


def _fallback(
    x, shift, scale, gate, mask, qkv_w, qkv_b, bias_k, bias_v, out_w, out_b,
    sin_t, cos_t, R, E, *, H, use_rope, dt,
):
    """vmap the block math over B (pure JAX, any backend)."""
    L = x.shape[2]
    fn = functools.partial(
        _sublayer_math, qkv_w=qkv_w, qkv_b=qkv_b, bias_k=bias_k[None],
        bias_v=bias_v[None], out_w=out_w, out_b=out_b, sin_q=sin_t[:L],
        cos_q=cos_t[:L], sin_b=sin_t[-1:], cos_b=cos_t[-1:], R=R, E=E, H=H,
        use_rope=use_rope, dt=dt,
    )
    return jax.vmap(
        lambda xb, sh, sc, g, m: fn(xb, sh, sc, g, m)
    )(x, shift, scale, gate, mask)

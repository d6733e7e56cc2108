"""Invariant Point Attention (flax.linen), c_z = 0 specialization.

Functional parity with the reference's OpenFold IPA as instantiated by the
latent model — no pair representation branch, frame-mask bias, softplus head
weights (reference `mdgen/model/ipa.py:34-255`, instantiated with ``c_z=0`` at
`mdgen/model/latent_model.py:62-70`).

TPU-first details:
  * the point-distance attention term is computed as
    |q|^2 + |k|^2 - 2 q·k so the dominant contraction hits the MXU instead of
    materializing the [L, L, H, P, 3] displacement tensor the reference builds
  * arbitrary leading batch dims: the same module serves the prepend-IPA stack
    ([B, L]) and interleaved IPA over trajectories ([B, T, L] with frames
    broadcast from [B, 1, L])
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..geometry.rigid import Rigid
from .layers import xavier, zeros_init

# softplus(x) == 1  =>  x = log(e - 1): every head starts with unit point weight
_POINT_WEIGHT_INIT = float(np.log(np.e - 1))


class InvariantPointAttention(nn.Module):
    c_hidden: int
    no_heads: int
    no_qk_points: int
    no_v_points: int
    inf: float = 1e5
    eps: float = 1e-8
    zero_init_out: bool = False
    # dropout on attention probabilities (reference `mdgen/model/ipa.py:205`);
    # active only when a "dropout" rng is provided to apply()
    dropout_rate: float = 0.0
    # compute dtype for the scalar path; the 3D point path stays f32 (frame
    # distances are numerically sensitive)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        s: jnp.ndarray,
        frames: Rigid,
        frame_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """s: [..., L, C]; frames batch shape broadcastable to [..., L];
        frame_mask: [..., L] with 1 = valid. Returns [..., L, C]."""
        H, ch = self.no_heads, self.c_hidden
        Pq, Pv = self.no_qk_points, self.no_v_points
        L = s.shape[-2]

        # fused scalar qkv: one weight stream instead of two
        qkv = nn.Dense(
            3 * H * ch, kernel_init=xavier, bias_init=zeros_init,
            dtype=self.dtype, name="linear_qkv",
        )(s).reshape(*s.shape[:-1], H, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # fused 3D point projection (f32), one weight stream
        pts = nn.Dense(
            H * (2 * Pq + Pv) * 3, kernel_init=xavier, bias_init=zeros_init,
            name="linear_points",
        )(s.astype(jnp.float32)).reshape(*s.shape[:-1], H * (2 * Pq + Pv), 3)
        pts = frames.expand_dims(-1).apply(pts).reshape(
            *s.shape[:-1], H, 2 * Pq + Pv, 3
        )
        q_pts = pts[..., :Pq, :]
        k_pts = pts[..., Pq : 2 * Pq, :]
        v_pts = pts[..., 2 * Pq :, :]

        # scalar attention term
        a = jnp.einsum("...qhc,...khc->...hqk", q, k).astype(jnp.float32)
        a = a * math.sqrt(1.0 / (3 * ch))

        # point-distance term: sum_p w_h ||q_i - k_j||^2, expanded so the
        # cross term is a single big contraction
        head_weights = nn.softplus(
            self.param(
                "head_weights",
                nn.initializers.constant(_POINT_WEIGHT_INIT),
                (H,),
            )
        ) * math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))
        q_sq = jnp.sum(q_pts**2, axis=(-1, -2))  # [..., L, H]
        k_sq = jnp.sum(k_pts**2, axis=(-1, -2))
        qk = jnp.einsum("...qhpc,...khpc->...hqk", q_pts, k_pts)
        dist2 = (
            jnp.moveaxis(q_sq, -1, -2)[..., :, None]
            + jnp.moveaxis(k_sq, -1, -2)[..., None, :]
            - 2 * qk
        )
        pt_att = dist2 * head_weights[..., :, None, None] * (-0.5)

        a = a + pt_att
        if frame_mask is not None:
            m2 = frame_mask[..., :, None] * frame_mask[..., None, :]
            a = a + (self.inf * (m2 - 1.0))[..., None, :, :]

        a = nn.softmax(a.astype(jnp.float32), axis=-1).astype(s.dtype)
        if self.dropout_rate > 0.0 and self.has_rng("dropout"):
            import jax

            keep = 1.0 - self.dropout_rate
            dmask = jax.random.bernoulli(self.make_rng("dropout"), keep, a.shape)
            a = a * dmask.astype(a.dtype) / keep

        # scalar output
        o = jnp.einsum("...hqk,...khc->...qhc", a, v).reshape(*s.shape[:-1], H * ch)

        # point output, rotated back into each query's local frame
        o_pt = jnp.einsum("...hqk,...khpc->...qhpc", a, v_pts)
        o_pt = frames.expand_dims(-1).expand_dims(-1).invert_apply(o_pt)
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt**2, axis=-1) + self.eps).reshape(
            *s.shape[:-1], H * Pv
        )
        o_pt = o_pt.reshape(*s.shape[:-1], H * Pv, 3)

        out = jnp.concatenate(
            [o, o_pt[..., 0], o_pt[..., 1], o_pt[..., 2], o_pt_norm], axis=-1
        )
        out_init = zeros_init if self.zero_init_out else xavier
        return nn.Dense(
            s.shape[-1], kernel_init=out_init, bias_init=zeros_init,
            dtype=self.dtype, name="linear_out",
        )(out)

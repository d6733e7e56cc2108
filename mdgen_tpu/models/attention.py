"""Rotary multi-head self-attention (flax.linen), XLA/MXU-first.

One clean einsum implementation replaces the reference's 510-line fairseq
port (reference `mdgen/model/mha.py:69`). Preserved semantics:

  * separate q/k/v projections with bias; q pre-scaled by head_dim**-0.5
  * ``add_bias_kv``: a learned extra key/value token appended at the end of
    the sequence, always attendable (reference `mdgen/model/mha.py:265-280`)
  * ESM-style rotary embeddings (GPT-NeoX half-rotation layout) applied to
    q and k — including the appended bias token, matching the reference's
    apply-after-append order
  * key-padding mask filled with -inf before a float32 softmax

Layout is batch-first (B, S, C); the reference's (S, B, C) transposes
disappear.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import xavier, zeros_init


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x, sin, cos):
    """x: [..., S, D]; sin/cos: [S, D] tables."""
    return x * cos + _rotate_half(x) * sin


def rotary_tables(seq_len: int, dim: int, dtype=jnp.float32):
    """ESM RotaryEmbedding convention: inv_freq over even indices, tables are
    [sin|sin] / [cos|cos] concatenations of the half-dim frequency grid."""
    inv_freq = 1.0 / (
        10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.sin(emb).astype(dtype), jnp.cos(emb).astype(dtype)


class RoPEAttention(nn.Module):
    """Self-attention over the last-but-one axis of a (B, S, C) tensor.

    ``impl`` selects the attention inner loop:
      * "dense"   — einsum logits (best for short sequences, differentiable)
      * "chunked" — blockwise online-softmax in pure JAX (O(S) memory,
                    differentiable; used for long frame axes in training)
      * "flash"   — Pallas TPU kernel (forward-only; sampling path)
      * "auto"    — dense when S <= 512 else chunked
    """

    embed_dim: int
    num_heads: int
    use_rope: bool = True
    add_bias_kv: bool = True
    impl: str = "auto"
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        """x: [B, S, C]; mask: [B, S] with 1 = valid. Returns [B, S, C]."""
        B, S, C = x.shape
        H = self.num_heads
        hd = C // H
        assert hd * H == C

        dense = lambda name: nn.Dense(
            C, kernel_init=xavier, bias_init=zeros_init, dtype=self.dtype,
            name=name,
        )
        q = dense("q_proj")(x) * hd**-0.5
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        q = q.reshape(B, S, H, hd)
        k = k.reshape(B, S, H, hd)
        v = v.reshape(B, S, H, hd)

        S_k = S
        if self.add_bias_kv:
            bias_k = self.param(
                "bias_k", nn.initializers.xavier_normal(), (1, 1, C)
            ).reshape(1, 1, H, hd)
            bias_v = self.param(
                "bias_v", nn.initializers.xavier_normal(), (1, 1, C)
            ).reshape(1, 1, H, hd)
            k = jnp.concatenate(
                [k, jnp.broadcast_to(bias_k.astype(k.dtype), (B, 1, H, hd))],
                axis=1,
            )
            v = jnp.concatenate(
                [v, jnp.broadcast_to(bias_v.astype(v.dtype), (B, 1, H, hd))],
                axis=1,
            )
            S_k = S + 1
            if mask is not None:
                mask = jnp.concatenate(
                    [mask, jnp.ones((B, 1), mask.dtype)], axis=1
                )

        if self.use_rope:
            sin, cos = rotary_tables(S_k, hd, q.dtype)
            q = apply_rotary(q, sin[:S][None, :, None, :], cos[:S][None, :, None, :])
            k = apply_rotary(k, sin[None, :, None, :], cos[None, :, None, :])

        impl = self.impl
        if impl == "auto":
            impl = "dense" if S_k <= 512 else "chunked"
        elif impl == "flash" and S_k <= 512:
            impl = "dense"  # dense wins below the logit-memory crossover

        if impl == "dense":
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            if mask is not None:
                neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
                logits = jnp.where(
                    mask[:, None, None, :] > 0, logits.astype(jnp.float32), neg
                )
            probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, C)
        else:
            from ..ops import chunked_attention, flash_attention

            fn = flash_attention if impl == "flash" else chunked_attention
            # fold heads into the batch axis: [B*H, S, hd]
            qf = q.transpose(0, 2, 1, 3).reshape(B * H, S, hd)
            kf = k.transpose(0, 2, 1, 3).reshape(B * H, S_k, hd)
            vf = v.transpose(0, 2, 1, 3).reshape(B * H, S_k, hd)
            if mask is not None:
                bias = jnp.where(mask > 0, 0.0, jnp.finfo(jnp.float32).min)
            else:
                bias = jnp.zeros((B, S_k), jnp.float32)
            bias = jnp.repeat(bias, H, axis=0)
            out = fn(qf, kf, vf, bias)
            out = out.reshape(B, H, S, hd).transpose(0, 2, 1, 3).reshape(B, S, C)

        return nn.Dense(
            C, kernel_init=xavier, bias_init=zeros_init, dtype=self.dtype,
            name="out_proj",
        )(out)

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

TPU-first: accepts the factorized trajectory tensor (B, T, L, C) directly
and attends over either axis via dot_general batch dimensions — the
reference's transpose+reshape round trips (`mdgen/model/latent_model.py:
456-476`) never materialize in HBM here.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import xavier, zeros_init


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _blockwise_xavier(n_blocks: int):
    """Initialize a fused (C, n*C) kernel as n independent xavier (C, C)
    blocks, preserving the per-projection init statistics of separate
    q/k/v layers."""

    def init(key, shape, dtype=jnp.float32):
        import jax

        C_in = shape[0]
        C_out = shape[1] // n_blocks
        keys = jax.random.split(key, n_blocks)
        return jnp.concatenate(
            [xavier(k, (C_in, C_out), dtype) for k in keys], axis=1
        )

    return init


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


def apply_rotary(x, sin, cos):
    """x: [..., S, D] (or broadcastable); sin/cos aligned to the S axis."""
    return x * cos + _rotate_half(x) * sin


class RoPEAttention(nn.Module):
    """Self-attention over one axis of a (B, S, C) or (B, T, L, C) tensor.

    For 4D inputs, ``axis`` selects the attention axis (1 = frames, 2 =
    residues); the other spatial axis batches. ``impl`` selects the inner
    loop:
      * "dense"   — einsum logits (best for short sequences, differentiable)
      * "chunked" — blockwise online-softmax in pure JAX (O(S) memory,
                    differentiable; the flash fallback on CPU)
      * "flash"   — Pallas TPU kernel, differentiable (FA2-style custom-vjp
                    backward); long frame axes in training AND sampling
      * "auto"    — dense when S <= 512, else flash on TPU / chunked on CPU
    """

    embed_dim: int
    num_heads: int
    use_rope: bool = True
    add_bias_kv: bool = True
    impl: str = "auto"
    # pallas_call has no GSPMD partitioning rule: when the attention axis is
    # sharded (sp>1 meshes shard T), the flash kernel would force an
    # all-gather/replicate of exactly the activations sp is meant to shard.
    # The model sets this False for the T-attention on sp meshes so "auto"/
    # "flash" degrade to the chunked online-softmax path, which XLA can
    # partition.
    allow_flash: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)
    # dropout on attention probabilities, the reference's placement
    # (`mdgen/model/mha.py:383-388`); active only when a "dropout" rng is
    # provided to apply() — inference/eval calls stay deterministic
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        axis: int = -2,
    ):
        """x: [B, S, C] or [B, T, L, C]; mask matches x's leading shape with
        1 = valid key. Returns the same shape as x."""
        squeeze = False
        if x.ndim == 3:
            x = x[:, None]  # (B, 1, S, C), attend over axis 2
            mask = mask[:, None] if mask is not None else None
            axis = 2
            squeeze = True
        else:
            axis = x.ndim + axis if axis < 0 else axis
            assert axis in (1, 2)

        B, T, L, C = x.shape
        H = self.num_heads
        hd = C // H
        assert hd * H == C
        S = x.shape[axis]

        # single fused qkv projection: one weight stream instead of three
        # (per-matmul DMA issue overhead dominates at these model sizes)
        qkv = nn.Dense(
            3 * C, kernel_init=_blockwise_xavier(3), bias_init=zeros_init,
            dtype=self.dtype, name="qkv_proj",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = (q * hd**-0.5).reshape(B, T, L, H, hd)
        k = k.reshape(B, T, L, H, hd)
        v = v.reshape(B, T, L, H, hd)

        S_k = S
        if self.add_bias_kv:
            bias_k = self.param(
                "bias_k", nn.initializers.xavier_normal(), (1, 1, C)
            ).reshape(1, 1, 1, H, hd)
            bias_v = self.param(
                "bias_v", nn.initializers.xavier_normal(), (1, 1, C)
            ).reshape(1, 1, 1, H, hd)
            shape = list(k.shape)
            shape[axis] = 1
            k = jnp.concatenate(
                [k, jnp.broadcast_to(bias_k.astype(k.dtype), shape)], axis=axis
            )
            v = jnp.concatenate(
                [v, jnp.broadcast_to(bias_v.astype(v.dtype), shape)], axis=axis
            )
            S_k = S + 1
            if mask is not None:
                mshape = list(mask.shape)
                mshape[axis] = 1
                mask = jnp.concatenate(
                    [mask, jnp.ones(mshape, mask.dtype)], axis=axis
                )

        if self.use_rope:
            sin, cos = rotary_tables(S_k, hd, q.dtype)
            # align tables to the attention axis of (B, T, L, H, hd)
            if axis == 1:
                sin_b = sin[None, :, None, None, :]
                cos_b = cos[None, :, None, None, :]
            else:
                sin_b = sin[None, None, :, None, :]
                cos_b = cos[None, None, :, None, :]

            def rope(t_, full):
                s_ = sin_b if full else (
                    sin_b[:, :S] if axis == 1 else sin_b[:, :, :S]
                )
                c_ = cos_b if full else (
                    cos_b[:, :S] if axis == 1 else cos_b[:, :, :S]
                )
                return t_ * c_ + _rotate_half(t_) * s_

            q = rope(q, full=False)
            k = rope(k, full=True)

        dropout_on = self.dropout_rate > 0.0 and self.has_rng("dropout")
        impl = self.impl
        if impl == "auto":
            # flash's CPU fallback is chunked, so "flash" is safe everywhere
            impl = "dense" if S_k <= 512 else "flash"
        elif impl == "flash" and S_k <= 512:
            impl = "dense"  # dense wins below the logit-memory crossover
        if impl == "flash" and not self.allow_flash:
            impl = "chunked"  # sharded attention axis: see allow_flash above
        if dropout_on:
            impl = "dense"  # prob-dropout needs materialized attention

        if impl == "dense":
            if axis == 2:
                logits = jnp.einsum("btqhd,btkhd->bthqk", q, k)
                key_mask = mask[:, :, None, None, :] if mask is not None else None
            else:
                logits = jnp.einsum("bqlhd,bklhd->blhqk", q, k)
                key_mask = (
                    jnp.moveaxis(mask, 1, 2)[:, :, None, None, :]
                    if mask is not None
                    else None
                )
            if key_mask is not None:
                neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
                logits = jnp.where(key_mask > 0, logits.astype(jnp.float32), neg)
            probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            if dropout_on:
                keep = 1.0 - self.dropout_rate
                dmask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, probs.shape
                )
                probs = probs * dmask.astype(probs.dtype) / keep
            if axis == 2:
                out = jnp.einsum("bthqk,btkhd->btqhd", probs, v)
            else:
                out = jnp.einsum("blhqk,bklhd->bqlhd", probs, v)
            out = out.reshape(B, T, L, C)
        else:
            from ..ops import chunked_attention, flash_attention

            fn = flash_attention if impl == "flash" else chunked_attention
            # fold (other-axis, heads) into batch: [N, S, hd]
            if axis == 1:
                qf = q.transpose(0, 2, 3, 1, 4).reshape(B * L * H, S, hd)
                kf = k.transpose(0, 2, 3, 1, 4).reshape(B * L * H, S_k, hd)
                vf = v.transpose(0, 2, 3, 1, 4).reshape(B * L * H, S_k, hd)
                mflat = (
                    jnp.moveaxis(mask, 1, 2).reshape(B * L, S_k)
                    if mask is not None
                    else jnp.ones((B * L, S_k), jnp.float32)
                )
            else:
                qf = q.transpose(0, 1, 3, 2, 4).reshape(B * T * H, S, hd)
                kf = k.transpose(0, 1, 3, 2, 4).reshape(B * T * H, S_k, hd)
                vf = v.transpose(0, 1, 3, 2, 4).reshape(B * T * H, S_k, hd)
                mflat = (
                    mask.reshape(B * T, S_k)
                    if mask is not None
                    else jnp.ones((B * T, S_k), jnp.float32)
                )
            bias = jnp.where(mflat > 0, 0.0, jnp.finfo(jnp.float32).min)
            bias = jnp.repeat(bias, H, axis=0)
            out = fn(qf, kf, vf, bias)
            if axis == 1:
                out = out.reshape(B, L, H, S, hd).transpose(0, 3, 1, 2, 4)
            else:
                out = out.reshape(B, T, H, S, hd).transpose(0, 1, 3, 2, 4)
            out = out.reshape(B, T, L, C)

        out = nn.Dense(
            C, kernel_init=xavier, bias_init=zeros_init, dtype=self.dtype,
            name="out_proj",
        )(out)
        return out[:, 0] if squeeze else out

"""DiT-style primitive layers (flax.linen).

Parity targets: ``modulate``/``TimestepEmbedder``/``FinalLayer``/``gelu``
(reference `mdgen/model/layers.py:14-84`), with the reference's load-bearing
initialization scheme (xavier everywhere, zero-init adaLN modulations and
output head, N(0, 0.02) timestep MLP — reference
`mdgen/model/latent_model.py:130-173`).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

xavier = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros


def modulate(x, shift, scale):
    """adaLN modulation; shift/scale get one broadcast axis inserted at
    position 1 (matches reference `mdgen/model/layers.py:14-15`)."""
    return x * (1 + scale[:, None]) + shift[:, None]


def gelu(x):
    """Exact (erf) gelu, matching the reference's activation choice."""
    return nn.gelu(x, approximate=False)


def timestep_embedding(t, dim, max_period=10000.0):
    """Sinusoidal embedding of (possibly fractional) timesteps, [B] -> [B, dim].
    Layout is [cos | sin] (reference `mdgen/model/layers.py:40-50`)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """Sinusoidal features -> 2-layer SiLU MLP."""

    hidden_size: int
    frequency_embedding_size: int = 256

    @nn.compact
    def __call__(self, t):
        x = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(
            self.hidden_size,
            kernel_init=nn.initializers.normal(0.02),
            bias_init=zeros_init,
        )(x)
        x = nn.silu(x)
        x = nn.Dense(
            self.hidden_size,
            kernel_init=nn.initializers.normal(0.02),
            bias_init=zeros_init,
        )(x)
        return x


class FinalLayer(nn.Module):
    """adaLN-zero output head: LN (no affine) -> modulate -> zero-init Dense."""

    hidden_size: int
    out_channels: int

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(
            2 * self.hidden_size, kernel_init=zeros_init, bias_init=zeros_init
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.out_channels, kernel_init=zeros_init, bias_init=zeros_init
        )(x)


def sincos_pos_embed(embed_dim: int, n_pos: int) -> np.ndarray:
    """Frozen 1D sin-cos table, [n_pos, embed_dim], layout [sin | cos]
    (reference `mdgen/model/latent_model.py:22-40`)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", np.arange(n_pos, dtype=np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)

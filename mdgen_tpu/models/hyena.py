"""Hyena operator (flax.linen): FFT long convolution over the frame axis.

Optional O(T log T) replacement for frame-axis attention (reference
`mdgen/model/standalone_hyena.py:188-254`, enabled by ``--hyena``). Semantics
preserved: implicit sine-MLP filter over a complex-exponential positional
embedding, exponential decay modulation, order-2 gated recurrence with a
depthwise short conv, and the reference's exact FFT crop window.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import xavier, zeros_init


def fftconv(u, k, D):
    """u: [B, D, L]; k: [D, L]; D (bias): [D]. Matches reference
    `standalone_hyena.py:15-26` including the [L-1 : 2L-1] crop."""
    L = u.shape[-1]
    fft_size = 2 * L
    k_f = jnp.fft.rfft(k, n=fft_size) / fft_size
    u_f = jnp.fft.rfft(u.astype(jnp.float32), n=fft_size)
    y = jnp.fft.irfft(u_f * k_f, n=fft_size, norm="forward")[..., L - 1 : 2 * L - 1]
    return (y + u * D[..., None]).astype(u.dtype)


def positional_embedding(emb_dim: int, seq_len: int) -> np.ndarray:
    """[1, L, emb_dim] = [t | Re(e^{-i f w}) | Im(e^{-i f w})]."""
    t = np.linspace(0, 1, seq_len)[None, :, None]
    bands = (emb_dim - 1) // 2
    t_rescaled = np.linspace(0, seq_len - 1, seq_len)[None, :, None]
    w = 2 * math.pi * t_rescaled / seq_len
    f = np.linspace(1e-4, bands - 1, bands)[None, None]
    z = np.exp(-1j * f * w)
    return np.concatenate([t, z.real, z.imag], axis=-1).astype(np.float32), t.astype(
        np.float32
    )


class HyenaFilter(nn.Module):
    """Implicit filter: sine MLP over positional features + decay modulation."""

    d_model: int
    emb_dim: int = 3
    order: int = 64  # MLP width
    seq_len: int = 1024
    w: float = 1.0  # sine activation frequency
    num_inner_mlps: int = 2
    fast_decay_pct: float = 0.3
    slow_decay_pct: float = 1.5
    target: float = 1e-2

    def setup(self):
        z, t = positional_embedding(self.emb_dim, self.seq_len)
        self.z = jnp.asarray(z)
        self.t = jnp.asarray(t)
        self.freqs = [
            self.param(f"sin_freq_{i}", nn.initializers.constant(self.w), (1, self.order))
            for i in range(self.num_inner_mlps + 1)
        ]
        self.linears = [
            nn.Dense(self.order, name=f"mlp_{i}") for i in range(self.num_inner_mlps + 1)
        ]
        self.out = nn.Dense(self.d_model, use_bias=False, name="mlp_out")
        max_decay = math.log(self.target) / self.fast_decay_pct
        min_decay = math.log(self.target) / self.slow_decay_pct
        self.deltas = jnp.asarray(
            np.linspace(min_decay, max_decay, self.d_model)[None, None].astype(np.float32)
        )
        self.bias = self.param("bias", nn.initializers.normal(1.0), (self.d_model,))

    def filter(self, L: int) -> jnp.ndarray:
        h = self.z[:, :L]
        for lin, freq in zip(self.linears, self.freqs):
            h = jnp.sin(freq * lin(h))
        h = self.out(h)
        decay = jnp.exp(-self.t[:, :L] * jnp.abs(self.deltas))
        return h * decay  # [1, L, d_model]


class HyenaOperator(nn.Module):
    """Order-2 Hyena recurrence over (B, T, C) sequences."""

    d_model: int
    l_max: int
    order: int = 2
    filter_order: int = 64

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        B, T, C = u.shape
        l_filter = min(T, self.l_max)
        inner = C * (self.order + 1)

        u = nn.Dense(inner, kernel_init=xavier, bias_init=zeros_init, name="in_proj")(u)
        # depthwise short conv, kernel 3, symmetric pad 2, crop to length
        u = jnp.swapaxes(u, 1, 2)  # B, D, T
        short = nn.Conv(
            features=inner,
            kernel_size=(3,),
            padding=((2, 2),),
            feature_group_count=inner,
            name="short_filter",
        )(jnp.swapaxes(u, 1, 2))  # conv over axis 1 -> back to B, T+2, D
        uc = jnp.swapaxes(short, 1, 2)[..., :l_filter]  # B, D, T

        splits = jnp.split(uc, self.order + 1, axis=1)
        *x, v = splits

        filt = HyenaFilter(
            d_model=C * (self.order - 1),
            order=self.filter_order,
            seq_len=self.l_max,
            name="filter_fn",
        )
        k = filt.filter(l_filter)[0]  # [T, C*(order-1)]
        k = jnp.swapaxes(k, 0, 1).reshape(self.order - 1, C, l_filter)
        bias = filt.bias.reshape(self.order - 1, C)

        for o, x_i in enumerate(reversed(x[1:])):
            v = v * x_i
            v = fftconv(v, k[o], bias[o])

        y = jnp.swapaxes(v * x[0], 1, 2)  # B, T, C
        return nn.Dense(C, kernel_init=xavier, bias_init=zeros_init, name="out_proj")(y)

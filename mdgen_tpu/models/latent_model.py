"""The latent MD trajectory denoiser (flax.linen).

SiT/DiT-style transformer over (B, T, L, D) latents with factorized
attention — residue axis L and frame axis T — plus IPA conditioning on key
frames. Behavioral parity with the reference model
(reference `mdgen/model/latent_model.py:43-483`):

  * prepend-IPA stack over key frames, broadcast-added over T
  * per-layer adaLN-zero with 9 modulation chunks (L-attn, T-attn, MLP)
  * RoPE MHA on both axes (optional Hyena on T), shared no-affine LayerNorm
    for both attention sublayers, exactly as the reference reuses it
  * design head: 3-layer MLP pooled over T -> 20 logits, added to the last
    20 latent channels
  * forward_inference converts design logits to a Dirichlet conditional flow
    entirely on-device (the reference syncs to SciPy per ODE step,
    `mdgen/model/latent_model.py:301`)

The module is shape-polymorphic in B/T/L; task structure arrives as data
(masks, frames), so one compiled denoiser serves all four task modes.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import MDGenConfig
from ..geometry.rigid import Rigid
from ..parallel.mesh import constrain_tokens, sp_size
from ..transport.dirichlet import DirichletConditionalFlow, simplex_proj
from ..transport.transport import t_to_alpha
from .attention import RoPEAttention
from .hyena import HyenaOperator
from .ipa import InvariantPointAttention
from .layers import (
    FinalLayer,
    TimestepEmbedder,
    gelu,
    modulate,
    sincos_pos_embed,
    xavier,
    zeros_init,
)


def _dense(n, name=None, zero=False, dtype=None):
    """Dense with the model init scheme; ``dtype`` is the COMPUTE dtype
    (params stay f32 — flax casts both for the matmul)."""
    return nn.Dense(
        n,
        kernel_init=zeros_init if zero else xavier,
        bias_init=zeros_init,
        dtype=dtype,
        name=name,
    )


def _ipa_args(cfg: MDGenConfig):
    return dict(
        c_hidden=cfg.ipa_head_dim,
        no_heads=cfg.ipa_heads,
        no_qk_points=cfg.ipa_qk,
        no_v_points=cfg.ipa_v,
        zero_init_out=True,
        dtype=cfg.compute_dtype,
        dropout_rate=cfg.dropout,
    )


class IPALayer(nn.Module):
    """IPA + residue-attention + MLP block used by the prepend-IPA stack
    (reference `mdgen/model/latent_model.py:332-384`). Operates on (B, L, C)."""

    cfg: MDGenConfig

    @nn.compact
    def __call__(self, x, mod, mask, frames: Rigid):
        """``mod`` is this layer's 6-chunk adaLN modulation slice, computed
        once for the whole tower (one fused matmul per step instead of one
        small weight-stream per layer)."""
        cfg = self.cfg
        C = cfg.embed_dim
        dt = cfg.compute_dtype
        sh_l, sc_l, g_l, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)

        x = x + InvariantPointAttention(**_ipa_args(cfg), name="ipa")(
            nn.LayerNorm(name="ipa_norm")(x), frames, frame_mask=mask
        )

        residual = x
        h = modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="mha_layer_norm")(x),
            sh_l, sc_l,
        ).astype(dt)
        h = RoPEAttention(C, cfg.mha_heads, use_rope=not cfg.no_rope,
                          dtype=dt, dropout_rate=cfg.dropout, name="mha_l")(h, mask)
        x = residual + g_l[:, None] * h

        residual = x
        h = modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="final_layer_norm")(x),
            sh_m, sc_m,
        ).astype(dt)
        h = _dense(C, "fc2", dtype=dt)(gelu(_dense(4 * C, "fc1", dtype=dt)(h)))
        return residual + g_m[:, None] * h


class LatentMDGenLayer(nn.Module):
    """Factorized spatio-temporal DiT block over (B, T, L, C)
    (reference `mdgen/model/latent_model.py:387-483`)."""

    cfg: MDGenConfig
    # False when the mesh shards the frame axis (sp>1): the Pallas flash
    # kernel cannot be GSPMD-partitioned over its attention axis, so the
    # T-attention must stay on the chunked/dense paths
    allow_flash_t: bool = True

    @nn.compact
    def __call__(self, x, mod, mask, frames: Optional[Rigid] = None):
        """``mod`` is this layer's 9-chunk adaLN modulation slice (fused
        trunk-wide matmul, see LatentMDGenModel.__call__)."""
        cfg = self.cfg
        B, T, L, C = x.shape
        dt = cfg.compute_dtype

        (sh_l, sc_l, g_l, sh_t, sc_t, g_t, sh_m, sc_m, g_m) = jnp.split(
            mod, 9, axis=-1
        )

        if cfg.interleave_ipa:
            x = x + InvariantPointAttention(**_ipa_args(cfg), name="ipa")(
                nn.LayerNorm(name="ipa_norm")(x),
                frames.expand_dims(1),
                frame_mask=mask,
            )

        # the reference reuses one no-affine LN for both attention sublayers
        mha_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, name="mha_layer_norm"
        )
        mha_l = RoPEAttention(C, cfg.mha_heads, use_rope=not cfg.no_rope,
                              dtype=dt, dropout_rate=cfg.dropout,
                              name="mha_l")

        # residue-axis attention (axis 2; frames batch) — no reshape copies.
        # modulate outputs materialize in the compute dtype: the consumer
        # matmuls cast anyway, and a bf16 store halves the HBM traffic of the
        # LN+modulate fusion (measured 13% of the sampling step at f32)
        use_fused = (
            cfg.fused_block
            and not self.is_initializing()
            and not (cfg.dropout > 0.0 and self.has_rng("dropout"))
            # pallas_call has no GSPMD partition rule: under an sp-sharded
            # frame axis the fused kernels would force a gather/replicate
            # (same reason allow_flash_t gates the flash path)
            and self.allow_flash_t
            # the fused kernels target the lane-starved peptide regime;
            # at large L the L-kernel's [rows, L, L, C] product and the
            # FFN kernel's [rows, L, 4C] hidden blow the VMEM budget, and
            # XLA's dense path tiles the MXU fine anyway — gate off
            and L <= 16
        )
        if use_fused:
            # one Pallas kernel for the whole sublayer (ops/fused_block.py);
            # reads mha_l's own params — identical tree, forward-only. The
            # residue mask is frame-constant by construction (run_ipa relies
            # on the same invariant), so one [B, L] slice drives all frames.
            from ..ops import fused_l_sublayer

            p = self.variables["params"]["mha_l"]
            x = fused_l_sublayer(
                x, sh_l, sc_l, g_l, mask[:, 0],
                p["qkv_proj"]["kernel"], p["qkv_proj"]["bias"],
                p["bias_k"].reshape(-1), p["bias_v"].reshape(-1),
                p["out_proj"]["kernel"], p["out_proj"]["bias"],
                num_heads=cfg.mha_heads, use_rope=not cfg.no_rope,
                compute_dtype=dt,
            )
        else:
            residual = x
            h = modulate(mha_norm(x), sh_l, sc_l).astype(dt)
            h = mha_l(h, mask, axis=2)
            x = residual + g_l[:, None] * h

        # frame-axis attention (axis 1; residues batch) or Hyena.
        # Fused T-kernel gate: only where the residue axis is lane-starved
        # (small L — at L >= 16 XLA's dense path tiles the MXU fine) and T
        # fits one VMEM-resident program (ops/fused_t_block.py).
        use_fused_t = use_fused and not cfg.hyena and L <= 16 and T <= 1024
        if use_fused_t:
            from ..ops import fused_t_sublayer

            p = self.variables["params"]["mha_t"]
            x = fused_t_sublayer(
                x, sh_t, sc_t, g_t, mask[:, 0],
                p["qkv_proj"]["kernel"], p["qkv_proj"]["bias"],
                p["bias_k"].reshape(-1), p["bias_v"].reshape(-1),
                p["out_proj"]["kernel"], p["out_proj"]["bias"],
                num_heads=cfg.mha_heads, use_rope=not cfg.no_rope,
                compute_dtype=dt,
            )
        else:
            residual = x
            h = modulate(mha_norm(x), sh_t, sc_t).astype(dt)
            if cfg.hyena:
                h_t = jnp.swapaxes(h, 1, 2).reshape(B * L, T, C)
                h_t = HyenaOperator(
                    d_model=C, l_max=cfg.num_frames, order=2,
                    filter_order=64, name="mha_t",
                )(h_t)
                h = jnp.swapaxes(h_t.reshape(B, L, T, C), 1, 2)
            else:
                h = RoPEAttention(C, cfg.mha_heads,
                                  use_rope=not cfg.no_rope,
                                  impl=cfg.attn_impl, dtype=dt,
                                  dropout_rate=cfg.dropout,
                                  allow_flash=self.allow_flash_t,
                                  name="mha_t")(h, mask, axis=1)
            x = residual + g_t[:, None] * h

        # MLP
        # the LN here is named final_layer_norm and fc1/fc2 params must
        # exist regardless of the fused path, so declare the modules first
        mlp_norm = nn.LayerNorm(use_bias=False, use_scale=False,
                                epsilon=1e-6, name="final_layer_norm")
        fc1 = _dense(4 * C, "fc1", dtype=dt)
        fc2 = _dense(C, "fc2", dtype=dt)
        if use_fused:
            from ..ops import fused_ffn_sublayer

            p = self.variables["params"]
            return fused_ffn_sublayer(
                x, sh_m, sc_m, g_m,
                p["fc1"]["kernel"], p["fc1"]["bias"],
                p["fc2"]["kernel"], p["fc2"]["bias"],
                compute_dtype=dt,
            )
        residual = x
        h = modulate(mlp_norm(x), sh_m, sc_m).astype(dt)
        h = fc2(gelu(fc1(h)))
        return residual + g_m[:, None] * h


class LatentMDGenModel(nn.Module):
    cfg: MDGenConfig
    latent_dim: int
    # Optional jax.sharding.Mesh with an "sp" axis: trunk activations are
    # constrained to P("dp", "sp") at layer boundaries so XLA keeps them
    # frame-sharded (sequence parallelism) and localizes the all-gather to
    # the T-attention contraction. None / no "sp" axis = no-op.
    mesh: Optional[object] = None

    def setup(self):
        cfg = self.cfg
        if cfg.design:
            assert cfg.prepend_ipa

        self.latent_to_emb = _dense(cfg.embed_dim, "latent_to_emb")
        if cfg.tps_condition or cfg.inpainting or cfg.dynamic_mpnn:
            self.latent_to_emb_f = _dense(cfg.embed_dim, "latent_to_emb_f")
            self.latent_to_emb_r = _dense(cfg.embed_dim, "latent_to_emb_r")

        self.cond_to_emb = _dense(cfg.embed_dim, "cond_to_emb")
        self.mask_to_emb = nn.Embed(
            2, cfg.embed_dim, embedding_init=nn.initializers.normal(1.0),
            name="mask_to_emb",
        )
        if cfg.design:
            self.x_d_to_emb = _dense(cfg.embed_dim, "x_d_to_emb")

        if cfg.prepend_ipa:
            if not cfg.no_aa_emb:
                self.aatype_to_emb = nn.Embed(
                    21, cfg.embed_dim,
                    embedding_init=nn.initializers.normal(1.0),
                    name="aatype_to_emb",
                )
            self.ipa_layers = [
                IPALayer(cfg, name=f"ipa_layers_{i}") for i in range(cfg.num_layers)
            ]

        layer_cls = LatentMDGenLayer
        if cfg.grad_checkpointing:
            layer_cls = nn.remat(LatentMDGenLayer, static_argnums=())
        allow_flash_t = sp_size(self.mesh) == 1
        self.layers = [
            layer_cls(cfg, allow_flash_t=allow_flash_t, name=f"layers_{i}")
            for i in range(cfg.num_layers)
        ]
        # fused adaLN-zero modulation producers: one matmul per tower per
        # step instead of one per layer (zero-init preserves adaLN-zero)
        self.trunk_adaln = _dense(
            9 * cfg.embed_dim * cfg.num_layers, "trunk_adaln", zero=True,
            dtype=cfg.compute_dtype,
        )
        if cfg.prepend_ipa:
            self.ipa_adaln = _dense(
                6 * cfg.embed_dim * cfg.num_layers, "ipa_adaln", zero=True,
                dtype=cfg.compute_dtype,
            )

        if not (cfg.dynamic_mpnn or cfg.mpnn):
            self.emb_to_latent = FinalLayer(
                cfg.embed_dim, self.latent_dim, name="emb_to_latent"
            )
        if cfg.design:
            self.fc1 = _dense(cfg.embed_dim, "fc1")
            self.fc2 = _dense(cfg.embed_dim, "fc2")
            self.fc3 = _dense(cfg.embed_dim, "fc3")
            self.emb_to_logits = _dense(20, "emb_to_logits")
            self.condflow = DirichletConditionalFlow(
                K=20, alpha_spacing=0.001, alpha_max=cfg.alpha_max
            )

        self.t_embedder = TimestepEmbedder(cfg.embed_dim, name="t_embedder")
        if cfg.abs_pos_emb:
            self.pos_embed = jnp.asarray(
                sincos_pos_embed(cfg.embed_dim, cfg.crop)[None]
            )
        if cfg.abs_time_emb:
            self.time_embed = jnp.asarray(
                sincos_pos_embed(cfg.embed_dim, cfg.num_frames)[None]
            )

    # ------------------------------------------------------------------

    def run_ipa(self, t, mask, start_frames, end_frames, aatype, x_d=None):
        """Key-frame conditioning tower (reference
        `mdgen/model/latent_model.py:175-210`). t: [B, C]; mask: [B, L]."""
        cfg = self.cfg
        if cfg.sim_condition or cfg.mpnn:
            B, L = mask.shape
            x = jnp.zeros((B, L, cfg.embed_dim))
            if aatype is not None and not cfg.no_aa_emb:
                x = x + self.aatype_to_emb(aatype)
            if cfg.design:
                x = x + self.x_d_to_emb(x_d)
            mods = jnp.split(self.ipa_adaln(nn.silu(t)), cfg.num_layers, axis=-1)
            for layer, mod in zip(self.ipa_layers, mods):
                x = layer(x, mod, mask, frames=start_frames)
            return x
        elif cfg.tps_condition or cfg.inpainting or cfg.dynamic_mpnn:
            x_f = start_frames.invert().compose(end_frames).to_tensor_7()
            x_r = end_frames.invert().compose(start_frames).to_tensor_7()
            x_f = self.latent_to_emb_f(x_f)
            x_r = self.latent_to_emb_r(x_r)
            if aatype is not None and not cfg.no_aa_emb:
                x_f = x_f + self.aatype_to_emb(aatype)
                x_r = x_r + self.aatype_to_emb(aatype)
            if cfg.design:
                x_f = x_f + self.x_d_to_emb(x_d)
                x_r = x_r + self.x_d_to_emb(x_d)
            mods = jnp.split(self.ipa_adaln(nn.silu(t)), cfg.num_layers, axis=-1)
            for layer, mod in zip(self.ipa_layers, mods):
                x_r = layer(x_r, mod, mask, frames=start_frames)
                x_f = layer(x_f, mod, mask, frames=end_frames)
            return x_r + x_f
        raise ValueError("prepend_ipa requires a conditioning mode")

    # ------------------------------------------------------------------

    def __call__(
        self,
        x,
        t,
        mask,
        start_frames: Optional[Rigid] = None,
        end_frames: Optional[Rigid] = None,
        x_cond=None,
        x_cond_mask=None,
        aatype=None,
    ):
        cfg = self.cfg
        if cfg.dynamic_mpnn:
            sel = jnp.asarray([0, x.shape[1] - 1])
            x, x_cond = x[:, sel], x_cond[:, sel]
            x_cond_mask, mask = x_cond_mask[:, sel], mask[:, sel]
        if cfg.mpnn:
            x, x_cond = x[:, :1], x_cond[:, :1]
            x_cond_mask, mask = x_cond_mask[:, :1], mask[:, :1]

        x_d = x[..., -20:].mean(axis=1) if cfg.design else None

        x = self.latent_to_emb(x)
        if cfg.abs_pos_emb:
            x = x + self.pos_embed
        if cfg.abs_time_emb:
            # slice to the live frame count (mpnn modes run on 1-2 key frames)
            x = x + self.time_embed[:, : x.shape[1], None]
        if x_cond is not None:
            x = x + self.cond_to_emb(x_cond) + self.mask_to_emb(x_cond_mask)

        t_emb = self.t_embedder(t * cfg.time_multiplier)[:, None]  # [B, 1, C]

        if cfg.prepend_ipa:
            x = x + self.run_ipa(
                t_emb[:, 0], mask[:, 0], start_frames, end_frames, aatype, x_d=x_d
            )[:, None]

        # one fused adaLN matmul for all trunk layers (9 chunks x n_layers)
        trunk_mods = self.trunk_adaln(nn.silu(t_emb))
        trunk_mods = jnp.split(trunk_mods, cfg.num_layers, axis=-1)
        x = constrain_tokens(x, self.mesh)
        for layer, mod in zip(self.layers, trunk_mods):
            x = layer(x, mod, mask, start_frames)
            x = constrain_tokens(x, self.mesh)

        latent = None
        if not (cfg.dynamic_mpnn or cfg.mpnn):
            latent = self.emb_to_latent(x, t_emb)
        if cfg.design:
            x_l = self.fc2(gelu(self.fc1(x))).mean(axis=1)  # pool over T
            logits = self.emb_to_logits(gelu(self.fc3(x_l)))  # [B, L, 20]
            if cfg.dynamic_mpnn or cfg.mpnn:
                return logits[:, None, :]
            latent = latent.at[..., -20:].add(logits[:, None, :, :])
        return latent

    # ------------------------------------------------------------------

    def forward_inference(
        self,
        x,
        t,
        mask,
        start_frames=None,
        end_frames=None,
        x_cond=None,
        x_cond_mask=None,
        aatype=None,
    ):
        """Inference-time forward. For design runs, converts the 20 logit
        channels into the Dirichlet conditional-flow vector field, entirely
        on-device (reference `mdgen/model/latent_model.py:263-317`)."""
        cfg = self.cfg
        if not cfg.design or cfg.dynamic_mpnn or cfg.mpnn:
            return self(
                x, t, mask, start_frames, end_frames, x_cond, x_cond_mask, aatype
            )

        x_discrete = x[..., -20:]
        latent = self(
            x, t, mask, start_frames, end_frames, x_cond, x_cond_mask, aatype
        )
        latent_continuous = latent[..., :-20]
        logits = latent[..., -20:]

        flow_probs = jax.nn.softmax(logits / cfg.dirichlet_flow_temp, axis=-1)
        # the reference projects off-simplex flow_probs via simplex_proj
        # (reference `mdgen/model/latent_model.py:288-294`); projection is the
        # identity on the simplex, so apply it unconditionally (jit-friendly —
        # no data-dependent branch)
        flow_probs = simplex_proj(flow_probs)
        alpha, dalpha_dt = t_to_alpha(t[0], cfg.alpha_max)
        alpha = jnp.minimum(alpha, cfg.alpha_max - self.condflow.alpha_spacing)

        c_factor = self.condflow.c_factor(x_discrete, alpha)
        if cfg.allow_nan_cfactor:
            c_factor = jnp.nan_to_num(c_factor)

        # flow_i = p_i c_i - x_i * sum_j p_j c_j, scaled by d(alpha)/dt
        pc = flow_probs * c_factor
        flow = (pc - x_discrete * pc.sum(axis=-1, keepdims=True)) * dalpha_dt
        return jnp.concatenate([latent_continuous, flow], axis=-1)

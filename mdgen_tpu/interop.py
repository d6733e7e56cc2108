"""Port reference (torch) LatentMDGenModel weights into this model's params.

The flax model fuses several of the reference's separate matmuls into single
weight streams (qkv projections, the IPA scalar/point projections, and the
per-tower adaLN modulation producers), so the port is a structured re-layout,
not a rename:

  * torch ``nn.Linear.weight`` is [out, in]; flax ``Dense.kernel`` is
    [in, out] — every kernel is a transpose.
  * ``RoPEAttention.qkv_proj`` = [Wq^T | Wk^T | Wv^T] along the output axis
    (reference keeps separate q/k/v projections,
    `mdgen/model/mha.py:111-115`).
  * ``InvariantPointAttention.linear_qkv`` interleaves the reference's
    ``linear_q`` / ``linear_kv`` per head: for head h the output block is
    [q_h | k_h | v_h] (each c_hidden wide), because the flax module reshapes
    to (..., H, 3*c_hidden) before splitting.
  * ``InvariantPointAttention.linear_points`` fuses ``linear_q_points`` and
    ``linear_kv_points``. The reference layouts are OpenFold's
    [x-block | y-block | z-block] with block entries h*P + p
    (`mdgen/model/ipa.py:126-151`); the flax layout is point-major
    (h*(2Pq+Pv) + slot)*3 + xyz with slots [q_pts | k_pts | v_pts].
  * ``trunk_adaln`` / ``ipa_adaln`` stack every layer's
    ``adaLN_modulation[1]`` along the output axis (layer-major; the 9/6
    chunk order within a layer matches the reference's ``.chunk()`` order).

Used by the golden parity tests (tests/test_model_golden.py) and available
for porting real reference checkpoints
(``NewMDGenWrapper.load_from_checkpoint`` state dicts with the ``model.``
prefix stripped).
"""
from __future__ import annotations

import numpy as np

from .config import MDGenConfig

__all__ = ["port_reference_state_dict"]


def _dense(sd, name):
    return {
        "kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
        "bias": np.ascontiguousarray(sd[f"{name}.bias"]),
    }


def _layer_norm(sd, name):
    return {
        "scale": np.ascontiguousarray(sd[f"{name}.weight"]),
        "bias": np.ascontiguousarray(sd[f"{name}.bias"]),
    }


def _mha(sd, name):
    """Reference fairseq-style MultiheadAttention -> RoPEAttention params."""
    wq, wk, wv = (sd[f"{name}.attn.{p}_proj.weight"] for p in "qkv")
    bq, bk, bv = (sd[f"{name}.attn.{p}_proj.bias"] for p in "qkv")
    out = {
        "qkv_proj": {
            "kernel": np.concatenate([wq.T, wk.T, wv.T], axis=1),
            "bias": np.concatenate([bq, bk, bv]),
        },
        "out_proj": _dense(sd, f"{name}.attn.out_proj"),
    }
    if f"{name}.attn.bias_k" in sd:
        out["bias_k"] = np.ascontiguousarray(sd[f"{name}.attn.bias_k"])
        out["bias_v"] = np.ascontiguousarray(sd[f"{name}.attn.bias_v"])
    return out


def _ipa(sd, name, *, c_hidden, no_heads, no_qk_points, no_v_points):
    """Reference OpenFold-style IPA -> fused-projection IPA params."""
    H, ch, Pq, Pv = no_heads, c_hidden, no_qk_points, no_v_points

    # scalar q/kv fusion: per-head [q | k | v] blocks
    wq = sd[f"{name}.linear_q.weight"].T  # [C, H*ch], col h*ch + c
    wkv = sd[f"{name}.linear_kv.weight"].T  # [C, 2*H*ch], col h*2ch + {k: c, v: ch+c}
    bq = sd[f"{name}.linear_q.bias"]
    bkv = sd[f"{name}.linear_kv.bias"]
    C = wq.shape[0]
    qkv_w = np.empty((C, 3 * H * ch), wq.dtype)
    qkv_b = np.empty((3 * H * ch,), bq.dtype)
    for h in range(H):
        o = h * 3 * ch
        qkv_w[:, o : o + ch] = wq[:, h * ch : (h + 1) * ch]
        qkv_w[:, o + ch : o + 2 * ch] = wkv[:, h * 2 * ch : h * 2 * ch + ch]
        qkv_w[:, o + 2 * ch : o + 3 * ch] = wkv[:, h * 2 * ch + ch : (h + 1) * 2 * ch]
        qkv_b[o : o + ch] = bq[h * ch : (h + 1) * ch]
        qkv_b[o + ch : o + 2 * ch] = bkv[h * 2 * ch : h * 2 * ch + ch]
        qkv_b[o + 2 * ch : o + 3 * ch] = bkv[h * 2 * ch + ch : (h + 1) * 2 * ch]

    # point fusion: reference layout is [x | y | z] blocks of width H*P with
    # entries h*P + p (OpenFold's split/stack, `mdgen/model/ipa.py:126-151`);
    # flax layout is flat (h*(2Pq+Pv) + slot)*3 + xyz, slots = [q | k | v] pts
    wqp = sd[f"{name}.linear_q_points.weight"].T  # [C, H*Pq*3]
    wkvp = sd[f"{name}.linear_kv_points.weight"].T  # [C, H*(Pq+Pv)*3]
    bqp = sd[f"{name}.linear_q_points.bias"]
    bkvp = sd[f"{name}.linear_kv_points.bias"]
    n_slots = 2 * Pq + Pv
    pts_w = np.empty((C, H * n_slots * 3), wqp.dtype)
    pts_b = np.empty((H * n_slots * 3,), bqp.dtype)
    for h in range(H):
        for slot in range(n_slots):
            if slot < Pq:  # q point
                src_w, src_b, idx = wqp, bqp, h * Pq + slot
                width = H * Pq
            else:  # k/v point (kv layout: [k_pts | v_pts] per head)
                src_w, src_b = wkvp, bkvp
                idx = h * (Pq + Pv) + (slot - Pq)
                width = H * (Pq + Pv)
            for xyz in range(3):
                dst = (h * n_slots + slot) * 3 + xyz
                pts_w[:, dst] = src_w[:, xyz * width + idx]
                pts_b[dst] = src_b[xyz * width + idx]

    return {
        "linear_qkv": {"kernel": qkv_w, "bias": qkv_b},
        "linear_points": {"kernel": pts_w, "bias": pts_b},
        "head_weights": np.ascontiguousarray(sd[f"{name}.head_weights"]),
        "linear_out": _dense(sd, f"{name}.linear_out"),
    }


def port_reference_state_dict(
    state_dict, cfg: MDGenConfig, latent_dim: int
) -> dict:
    """torch ``LatentMDGenModel.state_dict()`` (tensors or numpy arrays)
    -> flax params pytree for ``mdgen_tpu.models.LatentMDGenModel``.

    Covers all four task modes. ``state_dict`` keys use the reference names
    (no ``model.`` prefix). Buffers (pos_embed/time_embed) are skipped — the
    flax model computes the identical sin-cos tables.
    """
    sd = {
        k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                      if hasattr(v, "cpu") else v)
        for k, v in state_dict.items()
    }
    ipa_dims = dict(
        c_hidden=cfg.ipa_head_dim,
        no_heads=cfg.ipa_heads,
        no_qk_points=cfg.ipa_qk,
        no_v_points=cfg.ipa_v,
    )
    C, n = cfg.embed_dim, cfg.num_layers
    params: dict = {}

    params["latent_to_emb"] = _dense(sd, "latent_to_emb")
    if cfg.tps_condition or cfg.inpainting or cfg.dynamic_mpnn:
        params["latent_to_emb_f"] = _dense(sd, "latent_to_emb_f")
        params["latent_to_emb_r"] = _dense(sd, "latent_to_emb_r")
    params["cond_to_emb"] = _dense(sd, "cond_to_emb")
    params["mask_to_emb"] = {
        "embedding": np.ascontiguousarray(sd["mask_to_emb.weight"])
    }
    if cfg.design:
        params["x_d_to_emb"] = _dense(sd, "x_d_to_emb")
        for fc in ("fc1", "fc2", "fc3"):
            params[fc] = _dense(sd, fc)
        params["emb_to_logits"] = _dense(sd, "emb_to_logits")

    if cfg.prepend_ipa:
        if not cfg.no_aa_emb:
            params["aatype_to_emb"] = {
                "embedding": np.ascontiguousarray(sd["aatype_to_emb.weight"])
            }
        ipa_w = np.empty((C, 6 * C * n), np.float32)
        ipa_b = np.empty((6 * C * n,), np.float32)
        for i in range(n):
            ipa_w[:, i * 6 * C : (i + 1) * 6 * C] = sd[
                f"ipa_layers.{i}.adaLN_modulation.1.weight"
            ].T
            ipa_b[i * 6 * C : (i + 1) * 6 * C] = sd[
                f"ipa_layers.{i}.adaLN_modulation.1.bias"
            ]
            pre = f"ipa_layers.{i}"
            params[f"ipa_layers_{i}"] = {
                "ipa_norm": _layer_norm(sd, f"{pre}.ipa_norm"),
                "ipa": _ipa(sd, f"{pre}.ipa", **ipa_dims),
                "mha_l": _mha(sd, f"{pre}.mha_l"),
                "fc1": _dense(sd, f"{pre}.fc1"),
                "fc2": _dense(sd, f"{pre}.fc2"),
            }
        params["ipa_adaln"] = {"kernel": ipa_w, "bias": ipa_b}

    trunk_w = np.empty((C, 9 * C * n), np.float32)
    trunk_b = np.empty((9 * C * n,), np.float32)
    for i in range(n):
        trunk_w[:, i * 9 * C : (i + 1) * 9 * C] = sd[
            f"layers.{i}.adaLN_modulation.1.weight"
        ].T
        trunk_b[i * 9 * C : (i + 1) * 9 * C] = sd[
            f"layers.{i}.adaLN_modulation.1.bias"
        ]
        pre = f"layers.{i}"
        layer = {
            "mha_l": _mha(sd, f"{pre}.mha_l"),
            "fc1": _dense(sd, f"{pre}.fc1"),
            "fc2": _dense(sd, f"{pre}.fc2"),
        }
        if cfg.hyena:
            raise NotImplementedError(
                "hyena weight port not implemented (reference HyenaOperator "
                "parameterization); train natively instead"
            )
        layer["mha_t"] = _mha(sd, f"{pre}.mha_t")
        if cfg.interleave_ipa:
            layer["ipa_norm"] = _layer_norm(sd, f"{pre}.ipa_norm")
            layer["ipa"] = _ipa(sd, f"{pre}.ipa", **ipa_dims)
        params[f"layers_{i}"] = layer
    params["trunk_adaln"] = {"kernel": trunk_w, "bias": trunk_b}

    params["t_embedder"] = {
        "Dense_0": _dense(sd, "t_embedder.mlp.0"),
        "Dense_1": _dense(sd, "t_embedder.mlp.2"),
    }
    if not (cfg.dynamic_mpnn or cfg.mpnn):
        params["emb_to_latent"] = {
            "Dense_0": _dense(sd, "emb_to_latent.adaLN_modulation.1"),
            "Dense_1": _dense(sd, "emb_to_latent.linear"),
        }

    return jax_tree(params)


def jax_tree(tree):
    """numpy leaves -> jnp leaves (f32)."""
    import jax.numpy as jnp

    return {
        k: jax_tree(v) if isinstance(v, dict) else jnp.asarray(v, jnp.float32)
        for k, v in tree.items()
    }

"""Parity tests for the fused residue-attention sublayer kernel.

The fused op must reproduce the unfused module chain
LN -> modulate -> RoPEAttention(axis=2) -> gated residual
bit-for-bit in f32 (same math, same order up to reassociation) and within
bf16 tolerance in mixed precision. The Pallas kernel body runs in interpret
mode here; tests/test_flash_tpu.py-style on-chip checks live in
test_fused_block_tpu (MDGEN_TPU_TESTS=1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgen_tpu.models.attention import RoPEAttention
from mdgen_tpu.models.layers import modulate
from mdgen_tpu.ops.fused_block import fused_l_sublayer


def _setup(B=2, T=10, L=4, C=64, H=8, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, L, C)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, 1, C)) * 0.1, jnp.float32)
    sc = jnp.asarray(rng.normal(size=(B, 1, C)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, 1, C)) * 0.5, jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[1, -1] = 0.0  # one padded residue in batch row 1
    mask = jnp.asarray(mask)

    mask3 = jnp.broadcast_to(mask[:, None], (B, T, L))
    mha = RoPEAttention(C, H, use_rope=True, dtype=dtype)
    h = modulate(
        (x - x.mean(-1, keepdims=True))
        * jax.lax.rsqrt(x.var(-1, keepdims=True) + 1e-6),
        sh, sc,
    ).astype(dtype)
    params = mha.init(jax.random.PRNGKey(1), h, mask3, axis=2)
    y_ref = x + g[:, None] * mha.apply(params, h, mask3, axis=2).astype(
        jnp.float32
    )

    p = params["params"]
    arrays = dict(
        qkv_w=p["qkv_proj"]["kernel"], qkv_b=p["qkv_proj"]["bias"],
        bias_k=p["bias_k"].reshape(-1), bias_v=p["bias_v"].reshape(-1),
        out_w=p["out_proj"]["kernel"], out_b=p["out_proj"]["bias"],
    )
    return x, sh, sc, g, mask, arrays, y_ref, H


@pytest.mark.parametrize("interpret", [False, True])
def test_fused_matches_unfused_f32(interpret):
    """Fallback (pure-JAX) and Pallas-interpret paths vs the module chain."""
    x, sh, sc, g, mask, arrays, y_ref, H = _setup()
    y = fused_l_sublayer(
        x, sh, sc, g, mask, **arrays, num_heads=H,
        compute_dtype=jnp.float32, interpret=interpret, block_t=4,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_bf16_close():
    x, sh, sc, g, mask, arrays, y_ref, H = _setup(dtype=jnp.bfloat16)
    y = fused_l_sublayer(
        x, sh, sc, g, mask, **arrays, num_heads=H,
        compute_dtype=jnp.bfloat16, interpret=True, block_t=8,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=0.05, atol=0.05)


def test_fused_partial_tail_block():
    """T not divisible by block_t: the padded tail block must not corrupt
    valid rows."""
    x, sh, sc, g, mask, arrays, y_ref, H = _setup(T=10)
    y = fused_l_sublayer(
        x, sh, sc, g, mask, **arrays, num_heads=H,
        compute_dtype=jnp.float32, interpret=True, block_t=7,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_no_rope():
    x, sh, sc, g, mask, arrays, _, H = _setup()
    B, T, L, _ = x.shape
    mask3 = jnp.broadcast_to(mask[:, None], (B, T, L))
    mha = RoPEAttention(64, H, use_rope=False, dtype=jnp.float32)
    h = modulate(
        (x - x.mean(-1, keepdims=True))
        * jax.lax.rsqrt(x.var(-1, keepdims=True) + 1e-6),
        sh, sc,
    )
    params = {"params": {
        "qkv_proj": {"kernel": arrays["qkv_w"], "bias": arrays["qkv_b"]},
        "bias_k": arrays["bias_k"].reshape(1, 1, -1),
        "bias_v": arrays["bias_v"].reshape(1, 1, -1),
        "out_proj": {"kernel": arrays["out_w"], "bias": arrays["out_b"]},
    }}
    y_ref = x + g[:, None] * mha.apply(params, h, mask3, axis=2)
    y = fused_l_sublayer(
        x, sh, sc, g, mask, **arrays, num_heads=H, use_rope=False,
        compute_dtype=jnp.float32, interpret=True, block_t=4,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_model_forward_fused_matches_unfused(tol=2e-4):
    """Full-model parity: same params, fused_block on vs off (CPU fallback
    math — the Pallas body itself is covered by the interpret tests).
    ``tol`` is loosened by the on-chip variant (TPU default-precision
    matmuls are bf16-rounded differently across the two op graphs)."""
    from mdgen_tpu.tasks import prep_batch
    from test_model import make_batch, tiny_cfg

    rng = np.random.default_rng(7)
    cfg = tiny_cfg()
    from mdgen_tpu.models import LatentMDGenModel

    model = LatentMDGenModel(cfg, cfg.latent_dim)
    model_fused = LatentMDGenModel(
        cfg.replace(fused_block=True), cfg.latent_dim
    )
    batch = make_batch(rng, cfg)
    prep = prep_batch(cfg, batch)
    B, T, L = 2, cfg.num_frames, cfg.crop
    x = jnp.asarray(
        rng.normal(size=(B, T, L, cfg.latent_dim)).astype(np.float32)
    )
    t = jnp.full((B,), 0.4)
    params = model.init(jax.random.PRNGKey(0), x, t, **prep.model_kwargs)
    # break adaLN-zero symmetry so the attention sublayer actually fires
    params = jax.tree_util.tree_map(
        lambda p: p + 0.03 * np.random.default_rng(3).normal(size=p.shape)
        .astype(np.float32) if p.ndim >= 1 else p,
        params,
    )
    out = model.apply(params, x, t, **prep.model_kwargs)
    out_fused = model_fused.apply(params, x, t, **prep.model_kwargs)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out), rtol=tol, atol=tol
    )
    assert float(jnp.abs(out).max()) > 1e-3  # non-degenerate


def _setup_t(B=2, T=12, L=4, C=64, H=8, seed=0, dtype=jnp.float32,
             use_rope=True):
    """Unfused reference for the frame-axis (T) attention sublayer."""
    from mdgen_tpu.ops.fused_t_block import fused_t_sublayer

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, L, C)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, 1, C)) * 0.1, jnp.float32)
    sc = jnp.asarray(rng.normal(size=(B, 1, C)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, 1, C)) * 0.5, jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[1, -1] = 0.0  # one padded residue in batch row 1
    mask = jnp.asarray(mask)

    mask3 = jnp.broadcast_to(mask[:, None], (B, T, L))
    mha = RoPEAttention(C, H, use_rope=use_rope, dtype=dtype)
    h = modulate(
        (x - x.mean(-1, keepdims=True))
        * jax.lax.rsqrt(x.var(-1, keepdims=True) + 1e-6),
        sh, sc,
    ).astype(dtype)
    params = mha.init(jax.random.PRNGKey(1), h, mask3, axis=1)
    y_ref = x + g[:, None] * mha.apply(params, h, mask3, axis=1).astype(
        jnp.float32
    )

    p = params["params"]
    arrays = dict(
        qkv_w=p["qkv_proj"]["kernel"], qkv_b=p["qkv_proj"]["bias"],
        bias_k=p["bias_k"].reshape(-1), bias_v=p["bias_v"].reshape(-1),
        out_w=p["out_proj"]["kernel"], out_b=p["out_proj"]["bias"],
    )
    return fused_t_sublayer, x, sh, sc, g, mask, arrays, y_ref, H


@pytest.mark.parametrize("interpret", [False, True])
def test_fused_t_matches_unfused_f32(interpret):
    """Fallback (pure-JAX) and Pallas-interpret paths vs the module chain
    (RoPEAttention over axis=1, incl. the padded-residue mask and the
    bias token)."""
    fn, x, sh, sc, g, mask, arrays, y_ref, H = _setup_t()
    y = fn(
        x, sh, sc, g, mask, **arrays, num_heads=H,
        compute_dtype=jnp.float32, interpret=interpret,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_t_bf16_close():
    fn, x, sh, sc, g, mask, arrays, y_ref, H = _setup_t(dtype=jnp.bfloat16)
    y = fn(
        x, sh, sc, g, mask, **arrays, num_heads=H,
        compute_dtype=jnp.bfloat16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=0.05, atol=0.05)


def test_fused_t_no_rope():
    fn, x, sh, sc, g, mask, arrays, y_ref, H = _setup_t(use_rope=False)
    y = fn(
        x, sh, sc, g, mask, **arrays, num_heads=H, use_rope=False,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_gates_off_at_large_L():
    """ATLAS-like residue counts (L > 16) must bypass ALL fused kernels
    (the L-kernel's [rows, L, L, C] product and the FFN hidden blow VMEM
    at large L) — fused_block=True must be a clean no-op there."""
    from mdgen_tpu.models import LatentMDGenModel
    from mdgen_tpu.tasks import prep_batch
    from test_model import make_batch, tiny_cfg

    rng = np.random.default_rng(11)
    cfg = tiny_cfg().replace(crop=24, num_frames=6)
    model = LatentMDGenModel(cfg, cfg.latent_dim)
    model_fused = LatentMDGenModel(
        cfg.replace(fused_block=True), cfg.latent_dim
    )
    batch = make_batch(rng, cfg)
    prep = prep_batch(cfg, batch)
    B, T, L = 2, cfg.num_frames, cfg.crop
    x = jnp.asarray(
        rng.normal(size=(B, T, L, cfg.latent_dim)).astype(np.float32)
    )
    t = jnp.full((B,), 0.4)
    params = model.init(jax.random.PRNGKey(0), x, t, **prep.model_kwargs)
    out = model.apply(params, x, t, **prep.model_kwargs)
    out_fused = model_fused.apply(params, x, t, **prep.model_kwargs)
    np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out))


def _ffn_setup(B=2, T=10, L=4, C=64, seed=0, dtype=jnp.float32):
    from mdgen_tpu.models.layers import gelu

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, L, C)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, 1, C)) * 0.1, jnp.float32)
    sc = jnp.asarray(rng.normal(size=(B, 1, C)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, 1, C)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * C,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
    h = modulate(
        (x - x.mean(-1, keepdims=True))
        * jax.lax.rsqrt(x.var(-1, keepdims=True) + 1e-6),
        sh, sc,
    ).astype(dtype)
    y_ref = x + g[:, None] * (
        gelu(h @ w1.astype(dtype) + b1) @ w2.astype(dtype) + b2
    ).astype(jnp.float32)
    return x, sh, sc, g, (w1, b1, w2, b2), y_ref


@pytest.mark.parametrize("interpret", [False, True])
def test_fused_ffn_matches_module_f32(interpret):
    from mdgen_tpu.ops import fused_ffn_sublayer

    x, sh, sc, g, ws, y_ref = _ffn_setup()
    y = fused_ffn_sublayer(
        x, sh, sc, g, *ws, compute_dtype=jnp.float32,
        interpret=interpret, block_t=4,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_ffn_bf16_close():
    from mdgen_tpu.ops import fused_ffn_sublayer

    x, sh, sc, g, ws, y_ref = _ffn_setup(dtype=jnp.bfloat16)
    y = fused_ffn_sublayer(
        x, sh, sc, g, *ws, compute_dtype=jnp.bfloat16,
        interpret=True, block_t=8,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=0.05, atol=0.05)


def test_fused_ffn_partial_tail_block():
    from mdgen_tpu.ops import fused_ffn_sublayer

    x, sh, sc, g, ws, y_ref = _ffn_setup(T=10)
    y = fused_ffn_sublayer(
        x, sh, sc, g, *ws, compute_dtype=jnp.float32,
        interpret=True, block_t=7,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

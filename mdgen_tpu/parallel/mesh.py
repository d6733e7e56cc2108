"""Device mesh + sharding rules (GSPMD via jax.sharding / pjit).

TPU-native replacement for the reference's implicit Lightning-DDP/NCCL
story (reference `mdgen/train.py:46-48`, `mdgen/wrapper.py:22-28`):

  * ``dp`` axis: data parallelism — the batch axis is sharded, XLA inserts
    the gradient all-reduce over ICI (replaces NCCL all-reduce).
  * ``tp`` axis: Megatron-style tensor parallelism — FFN and attention
    projection kernels are sharded along their hidden dimension; XLA's
    sharding propagation inserts the activation collectives.

At reference model scale (5 layers x 384 dim) pure DP is optimal; tp is
exposed for ATLAS-scale (crop 256, T=250 -> 64k tokens/sample, batch 1) where
DP alone cannot use a slice.

  * ``sp`` axis: sequence parallelism over the frame axis T — activations
    [B, T, L, C] are sharded P("dp", "sp"); the L-attention, IPA broadcast,
    and MLP sublayers are embarrassingly parallel in T so they never
    communicate, and XLA inserts the k/v all-gather only inside the
    T-attention einsum. This divides activation memory by sp, the lever for
    ATLAS-scale (T=250 x L=256) batches that do not fit one chip.

Pipeline (pp) and expert (ep) axes intentionally do not exist: the flagship
model is a 5-layer dense DiT (no MoE; depth far too shallow for pp to beat
dp+tp+sp on a TPU slice).
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp_size: int = -1, tp_size: int = 1, sp_size: int = 1,
              devices=None) -> Mesh:
    """Build a (dp[, sp], tp) mesh. dp_size == -1 uses all remaining devices.

    With sp_size == 1 the mesh stays 2-axis ("dp", "tp"); sp_size > 1 adds a
    sequence-parallel axis between them (dp outermost so it can ride DCN on
    multi-host, sp/tp innermost on ICI).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = tp_size * sp_size
    if dp_size == -1:
        assert n % model == 0, (
            f"{n} devices not divisible by sp*tp={model}"
        )
        dp_size = n // model
    assert dp_size * model == n, (
        f"mesh {dp_size}x{sp_size}x{tp_size} != {n} devices"
    )
    if sp_size == 1:
        arr = np.asarray(devices).reshape(dp_size, tp_size)
        return Mesh(arr, axis_names=("dp", "tp"))
    arr = np.asarray(devices).reshape(dp_size, sp_size, tp_size)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def sp_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or "sp" not in mesh.axis_names:
        return 1
    return mesh.shape["sp"]


def token_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, T, ...] token tensors: batch over dp, frames over sp."""
    if sp_size(mesh) > 1:
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp"))


def constrain_tokens(x, mesh: Optional[Mesh]):
    """with_sharding_constraint an activation [B, T, ...] to P("dp", "sp").

    No-op without an sp axis (GSPMD propagation already handles pure dp/tp).
    Called at trunk-layer boundaries so XLA keeps activations sequence-
    sharded through the L-attention/MLP sublayers and localizes the
    all-gather to the T-attention contraction.
    """
    if sp_size(mesh) == 1:
        return x
    return jax.lax.with_sharding_constraint(x, token_sharding(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


# Parameter path patterns -> PartitionSpec for Megatron-style TP.
# fc1 expands D -> 4D (shard output dim); fc2 contracts 4D -> D (shard input
# dim); attention q/k/v shard the head dim (output), out_proj the input.
_TP_RULES = [
    (re.compile(r".*fc1.*kernel"), P(None, "tp")),
    (re.compile(r".*fc2.*kernel"), P("tp", None)),
    (re.compile(r".*(q_proj|k_proj|v_proj).*kernel"), P(None, "tp")),
    (re.compile(r".*out_proj.*kernel"), P("tp", None)),
]


def param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """NamedSharding tree for a parameter pytree.

    With tp == 1 everything is replicated. With tp > 1, the hot kernels are
    sharded per ``_TP_RULES`` whenever the sharded dimension divides evenly;
    everything else stays replicated.
    """
    tp = mesh.shape["tp"]

    def spec_for(path: str, leaf) -> NamedSharding:
        if tp > 1:
            for pat, spec in _TP_RULES:
                if pat.match(path):
                    # verify divisibility of the sharded axis
                    axis = [i for i, s in enumerate(spec) if s == "tp"]
                    if axis and leaf.shape[axis[0]] % tp == 0:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for kp, leaf in flat:
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        specs[path] = spec_for(path, leaf)

    def map_fn(kp, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        return specs[path]

    return jax.tree_util.tree_map_with_path(map_fn, params)


# batch keys whose axis 1 is the frame axis T (sp-shardable).
# NOT torsion_mask: it is [B, L, 7] — axis 1 is the residue axis.
_T_AXIS_KEYS = frozenset(
    {"atom14", "atom37", "torsions", "trans", "rots"}
)


def pad_batch_to_dp(batch: dict, mesh: Optional[Mesh]):
    """Pad every leading (batch) axis to a dp multiple by repeating row 0.

    Serving CLIs choose batch sizes by peptide grouping, not mesh shape;
    padding (dropped by the caller at save time) keeps every chip holding an
    equal shard. Returns ``(padded_batch, original_B)``.
    """
    sizes = [v.shape[0] for v in batch.values() if hasattr(v, "ndim") and v.ndim]
    if not sizes:
        return batch, 0
    B = sizes[0]
    if any(s != B for s in sizes):
        raise ValueError(f"unequal leading batch dims: {sorted(set(sizes))}")
    if mesh is None:
        return batch, B
    pad = -B % mesh.shape["dp"]
    if pad == 0:
        return batch, B

    def put(x):
        # the unequal-dims check above guarantees every ndim>=1 array leads
        # with B; only non-array metadata and 0-dim values pass through
        if not hasattr(x, "ndim") or x.ndim < 1:
            return x
        return np.concatenate([x, np.repeat(x[:1], pad, axis=0)])

    return {k: put(v) for k, v in batch.items()}, B


def shard_batch(mesh: Optional[Mesh], batch):
    """Device-put a host batch: leading axis sharded over dp, and — when the
    mesh has an sp axis — the frame axis of trajectory tensors over sp."""
    if mesh is None:
        return batch
    sh = batch_sharding(mesh)
    tok = token_sharding(mesh)
    rep = replicated(mesh)
    sp = sp_size(mesh)

    def put(key, x):
        if not hasattr(x, "ndim"):
            return x  # non-array metadata (e.g. names)
        if x.ndim < 1:
            return jax.device_put(x, rep)
        if x.shape[0] % mesh.shape["dp"] != 0:
            return jax.device_put(x, rep)
        if (sp > 1 and key in _T_AXIS_KEYS and x.ndim >= 2
                and x.shape[1] % sp == 0):
            return jax.device_put(x, tok)
        return jax.device_put(x, sh)

    if isinstance(batch, dict):
        return {k: put(k, v) for k, v in batch.items()}
    return jax.tree_util.tree_map(lambda x: put("", x), batch)

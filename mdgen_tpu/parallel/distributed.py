"""Multi-host (multi-process) training over DCN.

TPU-native replacement for the reference's Lightning DDP/NCCL multi-node
story (reference `train.py:46-48` spawns one Lightning rank per GPU;
`mdgen/wrapper.py:22-28` all-gathers logs across ranks):

  * ``init_distributed`` wraps ``jax.distributed.initialize`` — on a real
    TPU pod slice the coordinator/process topology is auto-detected from the
    TPU metadata; explicit flags cover CPU/GPU clusters and tests.
  * ``make_global_mesh`` builds a (dp[, sp], tp) mesh over ALL processes'
    devices with dp as the *outer* (DCN-riding) axis and sp/tp inner (ICI),
    via ``mesh_utils.create_hybrid_device_mesh``. Gradient all-reduces over
    dp are the only DCN traffic; activation collectives (tp/sp) stay on ICI.
  * ``global_batch_from_local`` assembles a globally-sharded jax.Array from
    each process's local batch slice (``jax.make_array_from_process_local_
    data``). There is no cross-host batch shuffle: each process loads only
    its own dp shard (see ``Loader(num_shards, shard_id)``), replacing the
    reference's torch DistributedSampler.

Metrics need no gather: jitted losses/metrics are computed on the global
(sharded) batch, so every process already holds the global value — the
reference's ``all_gather_object`` log sync has no counterpart by design.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import sp_size as _sp_size, _T_AXIS_KEYS


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Initialize JAX's distributed runtime (no-op if single-process).

    On TPU pods all arguments are auto-detected; pass them explicitly for
    CPU/GPU clusters. Returns True if a multi-process runtime was started.
    """
    if num_processes is not None and num_processes <= 1:
        return False
    if coordinator_address is None and num_processes is None:
        # bare single-host invocation: nothing to initialize
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def make_global_mesh(dp_size: int = -1, tp_size: int = 1,
                     sp_size: int = 1) -> Mesh:
    """(dp[, sp], tp) mesh over all processes' devices.

    Multi-process: dp is split (granule-wise) across hosts so the gradient
    all-reduce rides DCN while sp/tp collectives stay within each host's ICI
    domain. Single-process: plain reshape (same semantics as make_mesh).
    """
    n = jax.device_count()
    model = tp_size * sp_size
    if dp_size == -1:
        assert n % model == 0, f"{n} devices not divisible by sp*tp={model}"
        dp_size = n // model
    assert dp_size * model == n, (
        f"mesh {dp_size}x{sp_size}x{tp_size} != {n} devices"
    )
    axes = ("dp", "tp") if sp_size == 1 else ("dp", "sp", "tp")
    shape = (dp_size, tp_size) if sp_size == 1 else (dp_size, sp_size, tp_size)

    if jax.process_count() == 1:
        arr = np.asarray(jax.devices()).reshape(shape)
        return Mesh(arr, axis_names=axes)

    from jax.experimental import mesh_utils

    n_local = jax.local_device_count()
    procs = jax.process_count()
    # dp granules per process: model parallelism must fit inside one host's
    # ICI domain; the remaining local devices plus the host axis form dp.
    assert n_local % model == 0, (
        f"sp*tp={model} must divide local device count {n_local} "
        "(model parallelism cannot cross DCN)"
    )
    dp_local = n_local // model
    assert dp_local * procs == dp_size, (
        f"dp={dp_size} != {dp_local} local granules x {procs} processes"
    )
    if sp_size == 1:
        per_granule = (dp_local, tp_size)
        per_host = (procs, 1)
    else:
        per_granule = (dp_local, sp_size, tp_size)
        per_host = (procs, 1, 1)
    try:
        arr = mesh_utils.create_hybrid_device_mesh(
            per_granule, dcn_mesh_shape=per_host,
        )
    except ValueError:
        # Non-TPU clusters (CPU/GPU multi-process) carry no slice topology;
        # order devices process-major so each host's dp granules are
        # contiguous — the same dp-outer/DCN-riding layout as the TPU path.
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        arr = np.asarray(devs).reshape((procs,) + per_granule)
    return Mesh(arr.reshape(shape), axis_names=axes)


def local_batch_slice(num_shards: int, shard_id: int, batch_size: int):
    """Index range [lo, hi) of the global batch this process loads.

    Matches the dp-major device order of ``make_global_mesh``: process p's
    addressable dp rows are contiguous, so its batch rows are too.
    """
    assert batch_size % num_shards == 0, (
        f"global batch {batch_size} not divisible by {num_shards} processes"
    )
    per = batch_size // num_shards
    return shard_id * per, (shard_id + 1) * per


def global_batch_from_local(mesh: Mesh, local_batch: dict) -> dict:
    """Assemble a globally-dp-sharded batch from this process's local slice.

    local_batch values have leading dim B_local = B_global / process_count;
    the returned jax.Arrays are logically global, physically distributed —
    exactly what the jitted train step consumes.
    """
    procs = jax.process_count()
    sp = _sp_size(mesh)
    dp = mesh.shape["dp"]
    out = {}
    for k, v in local_batch.items():
        if not hasattr(v, "ndim"):
            out[k] = v
            continue
        v = np.asarray(v)
        # mirror shard_batch: values without a dp-divisible leading batch
        # dim (scalars, per-run metadata arrays) are replicated instead of
        # crashing make_array_from_process_local_data
        if v.ndim < 1 or (v.shape[0] * procs) % dp != 0:
            spec = P()
            gshape = v.shape
        elif sp > 1 and k in _T_AXIS_KEYS and v.ndim >= 2 and v.shape[1] % sp == 0:
            spec = P("dp", "sp")
            gshape = (v.shape[0] * procs,) + v.shape[1:]
        else:
            spec = P("dp")
            gshape = (v.shape[0] * procs,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), v, gshape
        )
    return out

"""Worker for the two-process jax.distributed CPU test.

Each rank owns 4 virtual CPU devices; the pair forms an 8-device global
mesh. The rank loads ONLY its dp shard of the batch (the multi-host data
contract of ``parallel/distributed.py``), assembles the global batch, runs
one jitted train step, and prints the (replicated) loss. The parent test
compares both ranks' losses to a single-process 8-device run.

Usage: python tests/_dist_worker.py <coordinator> <num_procs> <rank>
"""
import os
import sys

coordinator, num_procs, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import; pin the platform in
# live config too (same workaround as tests/conftest.py — must happen before
# backend init).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdgen_tpu.parallel import (  # noqa: E402
    global_batch_from_local,
    init_distributed,
    make_global_mesh,
)
from mdgen_tpu.parallel.distributed import local_batch_slice  # noqa: E402

started = init_distributed(
    coordinator_address=coordinator, num_processes=num_procs, process_id=rank
)
assert started, "expected a multi-process runtime"

assert jax.process_count() == num_procs
assert jax.device_count() == 4 * num_procs

from test_parallel import make_raw_batch, tiny_cfg  # noqa: E402

from mdgen_tpu.runtime import MDGenRuntime  # noqa: E402

cfg = tiny_cfg()
mesh = make_global_mesh(dp_size=-1, tp_size=2)
rt = MDGenRuntime(cfg, mesh=mesh)

B_global = 4
full = make_raw_batch(cfg, B=B_global, seed=0)
lo, hi = local_batch_slice(num_procs, rank, B_global)
local = {k: np.asarray(v)[lo:hi] for k, v in full.items()}
batch = global_batch_from_local(mesh, local)

rng = jax.random.PRNGKey(0)
state = rt.init(rng, batch)
state, metrics = rt.train_step(state, batch, jax.random.fold_in(rng, 1))
print(f"RANK{rank}_LOSS={float(np.asarray(metrics['loss'])):.6f}", flush=True)
jax.distributed.shutdown()

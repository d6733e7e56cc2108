"""Micro-benchmark: one jitted denoiser forward at the 4AA sampling shape.

Fast iteration loop for kernel/layout work — times just
``model_inf.apply(forward_inference)`` under lax.scan (100 steps, like the
euler sampler) so per-step costs match the real rollout without paying the
full tokenize/decode compile.

    python scripts/micro_fwd.py --batch 8 [--trace DIR]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--fused_block", action="store_true",
                   help="fused residue-attention sublayer Pallas kernel")
    args = p.parse_args()

    from mdgen_tpu.config import MDGenConfig
    from mdgen_tpu.data import synthetic_trajectory
    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.runtime import MDGenRuntime, tokenize_atom14
    from mdgen_tpu.runtime.wrapper import _inference_param_cast
    from mdgen_tpu.tasks import prep_batch

    B = args.batch
    cfg = MDGenConfig(
        sim_condition=True, prepend_ipa=True, abs_pos_emb=True,
        abs_time_emb=True, crop=4, num_frames=100,
        sampling_method="euler", inference_steps=100,
        precision="bf16-mixed", batch_size=B,
        fused_block=args.fused_block,
    )
    rt = MDGenRuntime(cfg)
    traj = synthetic_trajectory("ACDE", cfg.num_frames, seed=0)[None]
    batch = {
        "atom14": jnp.asarray(
            np.broadcast_to(traj, (B, *traj.shape[1:])).copy()),
        "seqres": jnp.asarray(np.broadcast_to(
            rc.str_sequence_to_aatype("ACDE")[None], (B, 4)).copy()),
        "mask": jnp.ones((B, 4), jnp.float32),
    }
    state = rt.init(jax.random.PRNGKey(0), batch)
    tok = tokenize_atom14(batch)
    prep = prep_batch(cfg, tok)
    T, L = cfg.num_frames, 4
    params = _inference_param_cast(cfg, state.params)
    kw = prep.model_kwargs

    @jax.jit
    def scan_fwd(params, x0):
        def body(x, t):
            out = rt.model_inf.apply(
                {"params": params}, x, jnp.full((B,), t, jnp.float32),
                method=rt.model_inf.forward_inference, **kw)
            return x + 0.01 * out, None

        x, _ = jax.lax.scan(
            body, x0, jnp.linspace(0.0, 1.0, args.steps))
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, L, cfg.latent_dim))
    t0 = time.perf_counter()
    out = scan_fwd(params, x0)
    out.block_until_ready()
    print(f"compile+run: {time.perf_counter()-t0:.1f}s  "
          f"out_mean={float(out.mean()):.4f}")

    def run():
        scan_fwd(params, x0).block_until_ready()

    if args.trace:
        run()
        jax.profiler.start_trace(args.trace)
        run()
        jax.profiler.stop_trace()
        print(f"trace -> {args.trace}")

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / args.steps
    print(f"per denoiser step: {dt*1e3:.3f} ms  (B={B}; "
          f"{B*cfg.num_frames/ (min(ts)/args.steps*100):.0f} frames/s-equiv)")


if __name__ == "__main__":
    main()

"""On-TPU performance harness: B-scaling, long-T flash timing, ATLAS shape,
optional jax.profiler trace.

Run ON THE REAL CHIP (no JAX_PLATFORMS override):

    python scripts/tpu_perf.py --bench batch_scaling
    python scripts/tpu_perf.py --bench flash
    python scripts/tpu_perf.py --bench atlas
    python scripts/tpu_perf.py --bench train4aa
    python scripts/tpu_perf.py --bench batch_scaling --trace /tmp/trace

Results feed BENCH.md (B-scaling table, MFU) — see VERDICT round-1 item 4.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def _cfg(**kw):
    from mdgen_tpu.config import MDGenConfig

    base = dict(
        sim_condition=True,
        prepend_ipa=True,
        abs_pos_emb=True,
        abs_time_emb=True,
        crop=4,
        num_frames=100,
        sampling_method="euler",
        inference_steps=100,
        precision="bf16-mixed",
    )
    base.update(kw)
    return MDGenConfig(**base)


def _batch(cfg, B, seq="ACDE"):
    from mdgen_tpu.data import synthetic_trajectory
    from mdgen_tpu.geometry import constants as rc

    L = len(seq)
    traj = synthetic_trajectory(seq, cfg.num_frames, seed=0)[None]
    seqres = rc.str_sequence_to_aatype(seq)[None]
    return {
        "atom14": np.broadcast_to(traj, (B, *traj.shape[1:])).copy(),
        "seqres": np.broadcast_to(seqres, (B, L)).copy(),
        "mask": np.ones((B, L), np.float32),
    }


def _time(fn, reps=3):
    fn()  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


# bf16 peak of one v5e chip; override for other hardware.
PEAK_FLOPS = float(os.environ.get("MDGEN_PEAK_FLOPS", 197e12))


def _flops(jitted, *args, **kwargs):
    """Total FLOPs of one call, from XLA's own cost model (None if the
    backend doesn't expose it)."""
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"  (cost_analysis unavailable: {type(e).__name__}: {e})")
        return None


def _mfu(flops, seconds):
    if flops is None or not seconds:
        return None
    return round(flops / seconds / PEAK_FLOPS * 100, 2)


def bench_batch_scaling(args):
    """Sampled frames/s at B in {1, 4, 8, 32} — the round-1 mystery was a
    flat per-sample cost (B=32 costing 32x B=1)."""
    from mdgen_tpu.runtime import MDGenRuntime

    out = {}
    for B in (1, 4, 8, 32):
        cfg = _cfg(batch_size=B)
        rt = MDGenRuntime(cfg)
        batch = _batch(cfg, B)
        state = rt.init(jax.random.PRNGKey(0), batch)
        start = batch["atom14"][:, 0]

        def run():
            o = rt.rollout(state.params, start, batch["seqres"], batch["mask"],
                           jax.random.PRNGKey(1), 2)
            jax.block_until_ready(o)

        if args.trace and B == args.trace_batch:
            run()
            jax.profiler.start_trace(args.trace)
            run()
            jax.profiler.stop_trace()
            print(f"trace written to {args.trace}")
        dt = _time(run)
        fl = _flops(rt._rollout, state.params, batch["atom14"][:, 0],
                    batch["seqres"], batch["mask"], jax.random.PRNGKey(1),
                    num_rollouts=2)
        frames = B * 2 * cfg.num_frames
        per_step = dt / (2 * cfg.inference_steps) * 1000
        out[B] = dict(frames_per_s=round(frames / dt, 1),
                      ms_per_denoiser_step=round(per_step, 3),
                      mfu_pct=_mfu(fl, dt))
        print(f"B={B}: {out[B]}")
    print(json.dumps({"bench": "batch_scaling", "results": out}))


def bench_flash(args):
    """Long-T attention: dense vs chunked vs Pallas flash at the 4AA
    training shape (T=1000) and T=1024/2048."""
    import jax.numpy as jnp

    from mdgen_tpu.ops.flash_attention import (
        _flash_attention_tpu,
        chunked_attention,
    )

    rng = np.random.default_rng(0)
    out = {}
    for T in (1000, 1024, 2048):
        N, d = 64, 24  # B*L*H at 4AA train shape: 1*4*16 = 64
        q = jnp.asarray(rng.normal(size=(N, T, d)), jnp.bfloat16) * 0.3
        k = jnp.asarray(rng.normal(size=(N, T + 1, d)), jnp.bfloat16) * 0.3
        v = jnp.asarray(rng.normal(size=(N, T + 1, d)), jnp.bfloat16) * 0.3
        bias = jnp.zeros((N, T + 1), jnp.float32)

        fl = _flash_attention_tpu(q, k, v, bias)
        ch = chunked_attention(q, k, v, bias)
        err = float(
            jnp.abs(fl.astype(jnp.float32) - ch.astype(jnp.float32)).max()
        )
        t_fl = _time(lambda: jax.block_until_ready(
            _flash_attention_tpu(q, k, v, bias)))
        t_ch = _time(lambda: jax.block_until_ready(
            chunked_attention(q, k, v, bias)))

        def dense():
            s = jnp.einsum("nqd,nkd->nqk", q.astype(jnp.float32),
                           k.astype(jnp.float32))
            p = jax.nn.softmax(s + bias[:, None, :], axis=-1)
            return jnp.einsum("nqk,nkd->nqd", p, v.astype(jnp.float32))

        dense_j = jax.jit(dense)
        t_de = _time(lambda: jax.block_until_ready(dense_j()))

        # fwd+bwd (training cost): FA2 custom-vjp vs chunked autodiff
        from mdgen_tpu.ops.flash_attention import _flash_vjp

        def g(fn):
            grads = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(
                    fn(q, k, v, bias).astype(jnp.float32) ** 2
                ),
                argnums=(0, 1, 2),
            ))
            return lambda: jax.block_until_ready(grads(q, k, v))

        t_flg = _time(g(_flash_vjp))
        t_chg = _time(g(chunked_attention))
        out[T] = dict(max_abs_err_vs_chunked=err,
                      flash_ms=round(t_fl * 1e3, 3),
                      chunked_ms=round(t_ch * 1e3, 3),
                      dense_ms=round(t_de * 1e3, 3),
                      flash_grad_ms=round(t_flg * 1e3, 3),
                      chunked_grad_ms=round(t_chg * 1e3, 3))
        print(f"T={T}: {out[T]}")
    print(json.dumps({"bench": "flash", "results": out}))


def bench_atlas(args):
    """ATLAS-scale (crop 256, T=250) sampling frames/s and train-step time.

    ``--atlas_train_batches 1,2,4`` sweeps the train batch size (remat on):
    L=256 is the MXU-friendly shape, so batching is the MFU lever the 4AA
    shape doesn't have (VERDICT round 4 weak #2). OOM at a given B is
    reported, not fatal.
    """
    from mdgen_tpu.runtime import MDGenRuntime

    cfg = _cfg(crop=256, num_frames=250, atlas=True, batch_size=1,
               grad_checkpointing=True, inference_steps=args.atlas_steps,
               fused_block=args.fused_block)
    seq = "A" * 256

    if not args.atlas_skip_sample:
        rt = MDGenRuntime(cfg)
        batch = _batch(cfg, 1, seq=seq)
        state = rt.init(jax.random.PRNGKey(0), batch)

        def sample():
            o, _ = rt.inference(state.params, batch, jax.random.PRNGKey(1))
            jax.block_until_ready(o)

        dt = _time(sample, reps=2)
        fps = cfg.num_frames / dt
        fl = _flops(rt._inference, state.params, batch, jax.random.PRNGKey(1))
        print(json.dumps({
            "bench": "atlas",
            "sample_frames_per_s": round(fps, 2),
            "nfe": cfg.inference_steps,
            "ms_per_denoiser_step": round(dt / cfg.inference_steps * 1e3, 2),
            "mfu_pct": _mfu(fl, dt),
        }), flush=True)
        # free the sampling footprint before the train sweep, or a train B
        # that fits a clean chip is reported as OOM
        del rt, state, batch

    for B in [int(b) for b in args.atlas_train_batches.split(",")]:
        cfgB = cfg.replace(batch_size=B)
        rtB = MDGenRuntime(cfgB)
        batchB = _batch(cfgB, B, seq=seq)
        try:
            # the train step donates its input state; chain it through reps
            st = [rtB.init(jax.random.PRNGKey(0), batchB)]

            def train():
                s, m = rtB.train_step(st[0], batchB, jax.random.PRNGKey(2))
                jax.block_until_ready(m["loss"])
                st[0] = s

            fl = _flops(rtB._train_step, st[0], batchB, jax.random.PRNGKey(2))
            dt = _time(train, reps=3)
            print(json.dumps({
                "bench": "atlas_train", "batch": B,
                "ms_per_step": round(dt * 1e3, 1),
                "samples_per_s": round(B / dt, 3),
                "mfu_pct": _mfu(fl, dt),
            }), flush=True)
        except Exception as e:  # XlaRuntimeError OOM at large B: report, go on
            print(json.dumps({
                "bench": "atlas_train", "batch": B,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)


def bench_train4aa(args):
    """4AA training-shape step time (T=1000 -> flash/chunked T-attention)."""
    from mdgen_tpu.runtime import MDGenRuntime

    cfg = _cfg(num_frames=1000, batch_size=args.train_batch,
               grad_checkpointing=True, attn_impl=args.attn_impl)
    rt = MDGenRuntime(cfg)
    batch = _batch(cfg, args.train_batch)
    state = rt.init(jax.random.PRNGKey(0), batch)

    st = [state]  # donated input state: chain it through reps

    def train():
        s, m = rt.train_step(st[0], batch, jax.random.PRNGKey(2))
        jax.block_until_ready(m["loss"])
        st[0] = s

    fl = _flops(rt._train_step, st[0], batch, jax.random.PRNGKey(2))
    dt = _time(train, reps=3)
    print(json.dumps({
        "bench": "train4aa", "batch": args.train_batch,
        "attn_impl": args.attn_impl,
        "ms_per_step": round(dt * 1e3, 1),
        "steps_per_s": round(1 / dt, 3),
        "mfu_pct": _mfu(fl, dt),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bench", required=True,
                   choices=["batch_scaling", "flash", "atlas", "train4aa"])
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--trace_batch", type=int, default=1)
    p.add_argument("--atlas_steps", type=int, default=10)
    p.add_argument("--atlas_train_batches", type=str, default="1",
                   help="comma list of train batch sizes for --bench atlas")
    p.add_argument("--atlas_skip_sample", action="store_true",
                   help="skip the sampling bench (train-batch sweep only)")
    p.add_argument("--train_batch", type=int, default=1)
    p.add_argument("--attn_impl", type=str, default="auto",
                   choices=["auto", "dense", "chunked", "flash"])
    p.add_argument("--fused_block", action="store_true",
                   help="fused Pallas serving sublayers (atlas bench; at "
                        "L=256 only the L-attention + FFN kernels apply — "
                        "the T kernel gates itself off above L=16)")
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    dict(batch_scaling=bench_batch_scaling, flash=bench_flash,
         atlas=bench_atlas, train4aa=bench_train4aa)[args.bench](args)


if __name__ == "__main__":
    main()

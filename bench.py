"""Benchmark: sampled trajectory frames/sec at the 4AA forward-sim config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json config #1): 4AA tetrapeptide forward simulation —
crop 4, 100-frame trajectories, Euler sampling (100 denoiser evaluations per
trajectory), reference model size (5 layers, dim 384, 16 heads, prepend-IPA,
abs pos emb). Single chip, batch 1, matching the reference's per-peptide
rollout loop (reference `sim_inference.py:101-116`).

vs_baseline: the reference publishes no numbers (BASELINE.json "published" is
empty) and the PyTorch stack cannot run here; we compare against a documented
first-principles estimate of the reference on A100 — ~1.5 ms/fwd at this
shape x ~100 dopri5 NFE per 100-frame trajectory ≈ 650 frames/s. Replace with
a measured value when one exists.
"""
import json
import subprocess
import sys
import time

import jax
import numpy as np

A100_BASELINE_FRAMES_PER_SEC = 650.0


def wait_for_devices(tries: int = 4, probe_timeout: int = 120) -> None:
    """A wedged axon tunnel makes jax.devices() BLOCK forever (observed:
    the relay process dying mid-run leaves connects refused/hanging). Probe
    in throwaway subprocesses with a timeout so bench.py either proceeds or
    fails fast with a JSON line instead of hanging past the driver's
    patience."""
    for i in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; assert jax.devices()"],
                timeout=probe_timeout, capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if i < tries - 1:
            time.sleep(60)
    raise RuntimeError(
        f"TPU runtime unreachable after {tries} probes "
        f"({probe_timeout}s timeout each)"
    )

NUM_FRAMES = 100
EULER_STEPS = 100
BATCH = 1
SEQ = "ACDE"


def main():
    wait_for_devices()

    from mdgen_tpu.config import MDGenConfig
    from mdgen_tpu.data import synthetic_trajectory
    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.runtime import MDGenRuntime

    cfg = MDGenConfig(
        sim_condition=True,
        prepend_ipa=True,
        abs_pos_emb=True,
        abs_time_emb=True,
        crop=4,
        num_frames=NUM_FRAMES,
        sampling_method="euler",
        inference_steps=EULER_STEPS,
        batch_size=BATCH,
        precision="bf16-mixed",  # serving precision (params stay f32)
    )
    rt = MDGenRuntime(cfg)

    traj = synthetic_trajectory(SEQ, NUM_FRAMES, seed=0)[None]  # 1, T, L, 14, 3
    seqres = rc.str_sequence_to_aatype(SEQ)[None]
    mask = np.ones_like(seqres, dtype=np.float32)
    batch = {
        "atom14": np.broadcast_to(traj, (BATCH, *traj.shape[1:])),
        "seqres": np.broadcast_to(seqres, (BATCH, len(SEQ))),
        "mask": np.broadcast_to(mask, (BATCH, len(SEQ))).astype(np.float32),
    }

    state = rt.init(jax.random.PRNGKey(0), batch)
    params = state.params
    start = np.asarray(traj[:, 0], np.float32)
    start = np.broadcast_to(start, (BATCH, *start.shape[1:]))

    # warmup / compile
    out = rt.rollout(params, start, batch["seqres"], batch["mask"],
                     jax.random.PRNGKey(1), 1)
    jax.block_until_ready(out)

    reps, rollouts = 3, 5
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = rt.rollout(params, start, batch["seqres"], batch["mask"],
                         jax.random.PRNGKey(2 + r), rollouts)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    frames = BATCH * rollouts * NUM_FRAMES
    fps = frames / min(times)
    print(
        json.dumps(
            {
                "metric": "4AA_fwd_sim_sampled_frames_per_sec",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / A100_BASELINE_FRAMES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({
            "metric": "4AA_fwd_sim_sampled_frames_per_sec",
            "value": 0.0,
            "unit": "frames/sec/chip",
            "vs_baseline": 0.0,
            "error": str(e)[:300],
        }))
        print(f"bench failed: {e}", file=sys.stderr)
        sys.exit(0)

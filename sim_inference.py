"""Forward-simulation inference: autoregressive rollout from a starting frame.

Rebuild of reference `sim_inference.py` with the entire rollout chain
(R rollouts x ODE solve x re-tokenization) compiled as one on-device program
(`MDGenRuntime.rollout`).

  python sim_inference.py --sim_ckpt workdir/run --data_dir data/4AA_sims \
      --split splits/4AA_test.csv --num_rollouts 10 --out_dir out/
"""
import argparse
import os
import time

import jax
import numpy as np
import pandas as pd


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--sim_ckpt", type=str, required=True,
                   help="checkpoint directory written by train.py")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--pdb_id", nargs="*", default=[])
    p.add_argument("--num_rollouts", type=int, default=100)
    p.add_argument("--out_dir", type=str, default=".")
    p.add_argument("--split", type=str, default="splits/4AA_test.csv")
    p.add_argument("--seed", type=int, default=137)
    p.add_argument("--batch_size", type=int, default=1,
                   help="peptides sampled per device batch")
    p.add_argument("--xtc", action="store_true",
                   help="superpose to frame 0 and write XTC + frame-0 PDB "
                        "(reference sim_inference.py:121-125)")
    p.add_argument("--fused_block", action="store_true",
                   help="run the denoiser's residue-attention sublayer as "
                        "one fused Pallas kernel per layer (TPU, "
                        "forward-only; ops/fused_block.py)")
    p.add_argument("--dp_size", type=int, default=0,
                   help="shard the peptide batch over a dp device mesh "
                        "(-1: all local devices; 0: single device). The "
                        "reference loops rollouts on one GPU "
                        "(sim_inference.py:61-116); here independent "
                        "trajectories scale across chips via GSPMD.")
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.protein import save_trajectory
    from mdgen_tpu.runtime import MDGenRuntime, checkpoint

    cfg = checkpoint.load_config(args.sim_ckpt)
    if args.fused_block:
        cfg = cfg.replace(fused_block=True)
    mesh = None
    if args.dp_size:
        from mdgen_tpu.parallel import make_mesh

        mesh = make_mesh(dp_size=args.dp_size)
        print(f"sampling on a dp={mesh.shape['dp']} device mesh")
    rt = MDGenRuntime(cfg, mesh=mesh)

    df = pd.read_csv(args.split, index_col="name")
    names = [n for n in df.index if not args.pdb_id or n in args.pdb_id]

    state = None
    rng = jax.random.PRNGKey(args.seed)

    # group same-length peptides into device batches: independent
    # trajectories sample in parallel on one chip (the reference loops B=1)
    by_len: dict[int, list[str]] = {}
    for name in names:
        by_len.setdefault(len(df.seqres[name]), []).append(name)

    for L, group in sorted(by_len.items()):
        for i in range(0, len(group), args.batch_size):
            chunk = group[i : i + args.batch_size]
            starts, seqreses = [], []
            for name in chunk:
                arr = np.lib.format.open_memmap(
                    os.path.join(args.data_dir, f"{name}{args.suffix}.npy"), "r"
                )
                starts.append(np.asarray(arr[0], dtype=np.float32))
                seqreses.append(rc.str_sequence_to_aatype(df.seqres[name]))
            start = np.stack(starts)  # B, L, 14, 3
            seqres = np.stack(seqreses)
            mask = np.ones_like(seqres, dtype=np.float32)

            if mesh is not None:
                # pad to a dp multiple (duplicates of peptide 0, dropped at
                # save time) so every chip holds an equal batch shard
                from mdgen_tpu.parallel import pad_batch_to_dp, shard_batch

                padded, _ = pad_batch_to_dp(
                    {"start": start, "seqres": seqres, "mask": mask}, mesh
                )
                sharded = shard_batch(mesh, padded)
                start, seqres, mask = (
                    sharded["start"], sharded["seqres"], sharded["mask"]
                )

            if state is None:
                example = {
                    "atom14": np.broadcast_to(
                        np.asarray(start)[:, None],
                        (start.shape[0], cfg.num_frames, *start.shape[1:]),
                    ),
                    "seqres": np.asarray(seqres),
                    "mask": np.asarray(mask),
                }
                state = rt.init(jax.random.PRNGKey(0), example)
                state, step = checkpoint.load_checkpoint(
                    args.sim_ckpt, state, mesh=mesh
                )
                print(f"restored {args.sim_ckpt} at step {step}")

            params = rt.eval_params(state)
            rng, key = jax.random.split(rng)
            t0 = time.time()
            traj = rt.rollout(params, start, seqres, mask, key, args.num_rollouts)
            traj = np.asarray(jax.block_until_ready(traj))
            dur = time.time() - t0
            frames = len(chunk) * traj.shape[1]
            print(
                f"{','.join(chunk)}: {frames} frames in {dur:.2f}s "
                f"({frames/dur:.1f} frames/s)"
            )
            for j, name in enumerate(chunk):
                save_trajectory(
                    traj[j], seqres[j],
                    os.path.join(args.out_dir, f"{name}.pdb"),
                    xtc_path=(os.path.join(args.out_dir, f"{name}.xtc")
                              if args.xtc else None),
                )


if __name__ == "__main__":
    main()

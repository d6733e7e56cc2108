"""Trajectory upsampling inference: inpaint between kept frames.

Rebuild of reference `upsampling_inference.py`: a low-framerate trajectory is
packed into windows with the kept frames every ``cond_interval`` steps (zeros
+ identity rotations in between), and the model fills the gaps.
"""
import argparse
import os

import numpy as np
import pandas as pd


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--suffix", type=str, default="_i100")
    p.add_argument("--pdb_id", nargs="*", default=[])
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--out_dir", type=str, default=".")
    p.add_argument("--split", type=str, default="splits/4AA_implicit_test.csv")
    p.add_argument("--seed", type=int, default=137)
    p.add_argument("--xtc", action="store_true",
                   help="superpose to frame 0 and write XTC + frame-0 PDB "
                        "(reference upsampling_inference.py:85-89)")
    p.add_argument("--fused_block", action="store_true",
                   help="fused Pallas serving kernels (TPU, forward-only; "
                        "ops/fused_block.py + ops/fused_ffn.py)")
    p.add_argument("--dp_size", type=int, default=0,
                   help="shard the batch over a dp device mesh "
                        "(-1: all local devices; 0: single device)")
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.protein import save_trajectory
    from mdgen_tpu.runtime import MDGenRuntime, checkpoint, tokenize_atom14

    cfg = checkpoint.load_config(args.ckpt)
    if args.fused_block:
        cfg = cfg.replace(fused_block=True)
    assert cfg.cond_interval, "checkpoint was not trained with --cond_interval"
    mesh = None
    if args.dp_size:
        from mdgen_tpu.parallel import make_mesh

        mesh = make_mesh(dp_size=args.dp_size)
        print(f"sampling on a dp={mesh.shape['dp']} device mesh")
    rt = MDGenRuntime(cfg, mesh=mesh)
    tokenize = jax.jit(tokenize_atom14)
    jkey = jax.random.PRNGKey(args.seed)
    state = None

    T, ci = cfg.num_frames, cfg.cond_interval
    kept_per_window = T // ci

    df = pd.read_csv(args.split, index_col="name")
    for name in df.index:
        if args.pdb_id and name not in args.pdb_id:
            continue
        seq = df.seqres[name]
        aatype = rc.str_sequence_to_aatype(seq)
        L = len(aatype)
        arr = np.asarray(
            np.lib.format.open_memmap(
                os.path.join(args.data_dir, f"{name}{args.suffix}.npy"), "r"
            ),
            dtype=np.float32,
        )
        # tokenize the kept (low-framerate) frames once, on device
        tok = tokenize(
            {
                "atom14": jnp.asarray(arr[None]),
                "seqres": jnp.asarray(aatype[None]),
                "mask": jnp.ones((1, L), jnp.float32),
            }
        )
        tok = {k: np.asarray(v)[0] for k, v in tok.items()}

        from mdgen_tpu.tasks import build_upsampling_windows, pad_window_groups

        window_batches = build_upsampling_windows(tok, T, ci)

        all_atom14 = []
        for group, n_real in pad_window_groups(window_batches, args.batch_size):
            batch = {k: np.stack([g[k] for g in group]) for k in group[0]}
            if mesh is not None:
                from mdgen_tpu.parallel import pad_batch_to_dp, shard_batch

                batch, _ = pad_batch_to_dp(batch, mesh)
                batch = shard_batch(mesh, batch)
            if state is None:
                state = rt.init(jax.random.PRNGKey(0), batch)
                state, step = checkpoint.load_checkpoint(
                    args.ckpt, state, mesh=mesh
                )
                print(f"restored {args.ckpt} at step {step}")
            jkey, sub = jax.random.split(jkey)
            atom14, _ = rt.inference(rt.eval_params(state), batch, sub)
            all_atom14.append(
                np.asarray(atom14)[:n_real].reshape(-1, L, 14, 3)
            )

        traj = np.concatenate(all_atom14, axis=0)
        path = os.path.join(args.out_dir, f"{name}.pdb")
        save_trajectory(
            traj, aatype, path,
            xtc_path=(os.path.join(args.out_dir, f"{name}.xtc")
                      if args.xtc else None),
        )
        print(f"{name}: wrote {len(traj)} frames to {path}")


if __name__ == "__main__":
    main()

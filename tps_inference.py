"""Transition path sampling inference: endpoint-conditioned trajectory
generation between the two lowest-flux metastable states.

Rebuild of reference `tps_inference.py` with the MSM state-selection pipeline
running on our NumPy analysis toolkit and the endpoint-conditioned batch fed
to the jitted inference program as raw atom14 (start frame repeated, end
frame last — tokenization happens on device).
"""
import argparse
import json
import os

import numpy as np
import pandas as pd


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--sim_ckpt", type=str, required=True)
    p.add_argument("--data_dir", type=str, required=True,
                   help="directory of atom14 .npy trajectories")
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--pdb_id", nargs="*", default=[])
    p.add_argument("--num_batches", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--out_dir", type=str, default=".")
    p.add_argument("--split", type=str, default="splits/4AA_test.csv")
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--n_chunks", type=int, default=1)
    p.add_argument("--seed", type=int, default=137)
    p.add_argument("--tica_lag", type=int, default=1000)
    p.add_argument("--msm_lag", type=int, default=1000)
    p.add_argument("--xtc", action="store_true",
                   help="superpose each path to its frame 0 and write XTC + "
                        "frame-0 PDB (reference tps_inference.py:135-141)")
    p.add_argument("--fused_block", action="store_true",
                   help="fused Pallas serving kernels (TPU, forward-only; "
                        "ops/fused_block.py + ops/fused_ffn.py)")
    p.add_argument("--dp_size", type=int, default=0,
                   help="shard the path batch over a dp device mesh "
                        "(-1: all local devices; 0: single device)")
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax

    from mdgen_tpu.analysis.reference_msm import load_or_build_msm, lowest_flux_states
    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.protein import save_trajectory
    from mdgen_tpu.runtime import MDGenRuntime, checkpoint

    cfg = checkpoint.load_config(args.sim_ckpt)
    if args.fused_block:
        cfg = cfg.replace(fused_block=True)
    assert cfg.tps_condition, "checkpoint was not trained with --tps_condition"
    mesh = None
    if args.dp_size:
        from mdgen_tpu.parallel import make_mesh

        mesh = make_mesh(dp_size=args.dp_size)
        print(f"sampling on a dp={mesh.shape['dp']} device mesh")
    rt = MDGenRuntime(cfg, mesh=mesh)
    rng = np.random.default_rng(args.seed)
    jkey = jax.random.PRNGKey(args.seed)
    state = None

    df = pd.read_csv(args.split, index_col="name")
    names = np.array_split(np.array(df.index), args.n_chunks)[args.chunk_idx]

    for name in names:
        if args.pdb_id and name not in args.pdb_id:
            continue
        if os.path.exists(f"{args.out_dir}/{name}_metadata.json"):
            continue
        seq = df.seqres[name]
        aatype = rc.str_sequence_to_aatype(seq)
        arr = np.lib.format.open_memmap(
            os.path.join(args.data_dir, f"{name}{args.suffix}.npy"), "r"
        )
        meta = load_or_build_msm(
            f"{args.out_dir}/{name}_metadata.pkl", arr, aatype,
            tica_lag=args.tica_lag, msm_lag=args.msm_lag, seed=args.seed,
        )
        start_state, end_state = lowest_flux_states(meta["cmsm"])
        ref_discrete = meta["ref_discrete"]
        start_idxs = np.where(ref_discrete == start_state)[0]
        end_idxs = np.where(ref_discrete == end_state)[0]
        if len(start_idxs) == 0 or len(end_idxs) == 0:
            print(f"no start/end state frames for {name}, skipping")
            continue

        L = len(aatype)
        T = cfg.num_frames
        metadata = []
        for i in range(args.num_batches):
            B = args.batch_size
            si = rng.choice(start_idxs, B)
            ei = rng.choice(end_idxs, B)
            atom14 = np.empty((B, T, L, 14, 3), np.float32)
            for j in range(B):
                atom14[j, :] = arr[si[j]]
                atom14[j, -1] = arr[ei[j]]
            batch = {
                "atom14": atom14,
                "seqres": np.broadcast_to(aatype, (B, L)),
                "mask": np.ones((B, L), np.float32),
            }
            if mesh is not None:
                from mdgen_tpu.parallel import pad_batch_to_dp, shard_batch

                batch, _ = pad_batch_to_dp(batch, mesh)
                batch = shard_batch(mesh, batch)
            if state is None:
                state = rt.init(jax.random.PRNGKey(0), batch)
                state, step = checkpoint.load_checkpoint(
                    args.sim_ckpt, state, mesh=mesh
                )
                print(f"restored {args.sim_ckpt} at step {step}")
            jkey, sub = jax.random.split(jkey)
            atom14s, _ = rt.inference(rt.eval_params(state), batch, sub)
            atom14s = np.asarray(atom14s)[:B]
            for j in range(B):
                idx = i * B + j
                path = os.path.join(args.out_dir, f"{name}_{idx}.pdb")
                save_trajectory(
                    atom14s[j], aatype, path,
                    xtc_path=(os.path.join(args.out_dir, f"{name}_{idx}.xtc")
                              if args.xtc else None),
                )
                metadata.append({
                    "name": str(name),
                    "start_idx": int(si[j]),
                    "end_idx": int(ei[j]),
                    "start_state": int(start_state),
                    "end_state": int(end_state),
                    "path": path,
                })
        with open(f"{args.out_dir}/{name}_metadata.json", "w") as fh:
            json.dump(metadata, fh)


if __name__ == "__main__":
    main()

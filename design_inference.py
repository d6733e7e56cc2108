"""Inpainting / design inference: redesign residues along high-flux
transition windows of the reference MD.

Rebuild of reference `design_inference.py`: pick the highest-flux metastable
transition, find windows whose start frame is in the start state and whose
end frame (num_frames later) is in the end state, run inpainting/design
inference, record designed sequences.
"""
import argparse
import json
import os

import numpy as np
import pandas as pd


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--sim_ckpt", type=str, required=True)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--pdb_id", nargs="*", default=[])
    p.add_argument("--num_frames", type=int, default=100)
    p.add_argument("--num_batches", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--random_start_idx", action="store_true")
    p.add_argument("--out_dir", type=str, default=".")
    p.add_argument("--split", type=str, default="splits/4AA_test.csv")
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--n_chunks", type=int, default=1)
    p.add_argument("--seed", type=int, default=137)
    p.add_argument("--tica_lag", type=int, default=1000)
    p.add_argument("--msm_lag", type=int, default=1000)
    p.add_argument("--fused_block", action="store_true",
                   help="fused Pallas serving kernels (TPU, forward-only; "
                        "ops/fused_block.py + ops/fused_ffn.py)")
    p.add_argument("--dirichlet_flow_temp", type=float, default=None,
                   help="override the checkpoint's Dirichlet-flow sampling "
                        "temperature (reference stores it train-time only, "
                        "mdgen/parsing.py:105; sampling-time sweep needs no "
                        "retrain)")
    p.add_argument("--dp_size", type=int, default=0,
                   help="shard the batch over a dp device mesh "
                        "(-1: all local devices; 0: single device)")
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax

    from mdgen_tpu.analysis.reference_msm import highest_flux_states, load_or_build_msm
    from mdgen_tpu.geometry import constants as rc
    from mdgen_tpu.protein import atom14_to_pdb
    from mdgen_tpu.runtime import MDGenRuntime, checkpoint

    cfg = checkpoint.load_config(args.sim_ckpt)
    if args.fused_block:
        cfg = cfg.replace(fused_block=True)
    if args.dirichlet_flow_temp is not None:
        cfg = cfg.replace(dirichlet_flow_temp=args.dirichlet_flow_temp)
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
        seq = df.seqres[name]
        aatype = rc.str_sequence_to_aatype(seq)
        L = len(aatype)
        arr = np.lib.format.open_memmap(
            os.path.join(args.data_dir, f"{name}{args.suffix}.npy"), "r"
        )
        try:
            meta = load_or_build_msm(
                f"{args.out_dir}/{name}_metadata.pkl", arr, aatype,
                tica_lag=args.tica_lag, msm_lag=args.msm_lag, seed=args.seed,
            )
            start_state, end_state = highest_flux_states(meta["cmsm"])
            ref_discrete = meta["ref_discrete"]
        except Exception as e:
            if not args.random_start_idx:
                raise
            # with --random_start_idx the MSM only labels metadata
            print(f"MSM unavailable for {name} ({e}); using random windows")
            start_state = end_state = -1
            ref_discrete = np.zeros(len(arr), dtype=int)
        if cfg.frame_interval:
            arr = arr[:: cfg.frame_interval]
            ref_discrete = ref_discrete[:: cfg.frame_interval]

        T = args.num_frames
        is_start = ref_discrete == start_state
        is_end = ref_discrete == end_state
        trans_idx = np.where(is_start[:-T] * is_end[T:])[0]
        if len(trans_idx) == 0 and not args.random_start_idx:
            print(f"no transition window for {name}, skipping")
            continue

        metadata = []
        for i in range(args.num_batches):
            B = args.batch_size
            if args.random_start_idx:
                si = rng.integers(0, len(arr) - T, B)
            else:
                si = rng.choice(trans_idx, B)
            atom14 = np.stack(
                [np.asarray(arr[s : s + T], np.float32) for s in si]
            )
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
            atom14s, aa_out = rt.inference(rt.eval_params(state), batch, sub)
            atom14s, aa_out = np.asarray(atom14s)[:B], np.asarray(aa_out)[:B]
            for j in range(B):
                idx = i * B + j
                path = os.path.join(args.out_dir, f"{name}_{idx}.pdb")
                atom14_to_pdb(atom14s[j], aa_out[j, 0], path)
                metadata.append({
                    "name": str(name),
                    "start_idx": int(si[j]),
                    "end_idx": int(si[j] + T),
                    "start_state": int(start_state),
                    "end_state": int(end_state),
                    "aa_out": rc.aatype_to_str_sequence(aa_out[j, 0]),
                    "seqres": seq,
                    "path": path,
                })
        with open(f"{args.out_dir}/{name}_metadata.json", "w") as fh:
            json.dump(metadata, fh)


if __name__ == "__main__":
    main()

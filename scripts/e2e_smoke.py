"""End-to-end smoke: synthetic data -> train -> rollout -> PDB -> analysis.

Exercises every layer of the framework in one run (the minimum end-to-end
slice of SURVEY.md §7) and prints a compact summary. Used as the manual
verification recipe; keep it fast (~minutes).

  python scripts/e2e_smoke.py --steps 200 --out /tmp/e2e
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--steps", type=int, default=200)
parser.add_argument("--out", type=str, default="/tmp/e2e_smoke")
parser.add_argument("--num_frames", type=int, default=32)
parser.add_argument("--batch_size", type=int, default=8)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax
import numpy as np

from mdgen_tpu.analysis import featurize_torsions, hist_jsd
from mdgen_tpu.config import MDGenConfig
from mdgen_tpu.data import Loader, MDGenDataset, write_synthetic_dataset
from mdgen_tpu.geometry import constants as rc
from mdgen_tpu.protein import atom14_to_pdb, load_pdb_trajectory
from mdgen_tpu.runtime import MDGenRuntime, checkpoint

if args.cpu:
    jax.config.update("jax_platforms", "cpu")


def main():
    os.makedirs(args.out, exist_ok=True)
    print("devices:", jax.devices())

    # 1. synthetic dataset
    seqs = [("AAAA", "AAAA"), ("ACDE", "ACDE"), ("WYNK", "WYNK")]
    data_dir = os.path.join(args.out, "data")
    split = write_synthetic_dataset(data_dir, seqs, num_frames=600, seed=0)
    print("wrote synthetic dataset:", split)

    cfg = MDGenConfig(
        sim_condition=True,
        prepend_ipa=True,
        abs_pos_emb=True,
        abs_time_emb=True,
        crop=4,
        num_frames=args.num_frames,
        num_layers=3,
        embed_dim=128,
        mha_heads=8,
        ipa_heads=2,
        ipa_head_dim=16,
        ipa_qk=4,
        ipa_v=4,
        batch_size=args.batch_size,
        lr=3e-4,
        ema=True,
        sampling_method="euler",
        inference_steps=50,
        overfit=True,
    )

    rt = MDGenRuntime(cfg)
    ds = MDGenDataset(cfg, split, data_dir, repeat=64)
    loader = Loader(ds, cfg.batch_size, shuffle=True, seed=0)

    batch0 = next(iter(loader))
    batch0.pop("name")
    state = rt.init(jax.random.PRNGKey(0), batch0)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"params: {n_params:,}")

    # 2. train
    eval_key = jax.random.PRNGKey(999)
    loss0 = float(rt.val_step(state.params, batch0, eval_key)["loss"])
    t0 = time.time()
    step = 0
    while step < args.steps:
        for batch in loader:
            batch.pop("name")
            state, metrics = rt.train_step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(1), step)
            )
            step += 1
            if step >= args.steps:
                break
    jax.block_until_ready(state.params)
    dur = time.time() - t0
    loss1 = float(rt.val_step(state.params, batch0, eval_key)["loss"])
    print(
        f"trained {args.steps} steps in {dur:.1f}s "
        f"({args.steps/dur:.2f} steps/s); fixed-key loss {loss0:.4f} -> {loss1:.4f}"
    )
    assert loss1 < loss0, "training did not reduce the loss"

    # 3. checkpoint round trip
    ck = checkpoint.save_checkpoint(os.path.join(args.out, "ckpt"), state, cfg,
                                    int(state.step))
    print("checkpoint:", ck)

    # 4. rollout + PDB
    name, seq = seqs[1]
    arr = np.load(os.path.join(data_dir, f"{name}.npy"))
    start = np.asarray(arr[:1], np.float32)
    seqres = rc.str_sequence_to_aatype(seq)[None]
    mask = np.ones_like(seqres, np.float32)
    t0 = time.time()
    traj = rt.rollout(
        rt.eval_params(state), start, seqres, mask, jax.random.PRNGKey(7), 3
    )
    traj = np.asarray(jax.block_until_ready(traj))
    dur = time.time() - t0
    print(f"rollout: {traj.shape[1]} frames in {dur:.1f}s "
          f"({traj.shape[1]/dur:.1f} frames/s)")
    assert np.isfinite(traj).all()

    pdb_path = os.path.join(args.out, f"{name}.pdb")
    atom14_to_pdb(traj[0], seqres[0], pdb_path)

    # 5. analysis: JSD of torsion marginals generated vs training data
    gen_atom14, aatype = load_pdb_trajectory(pdb_path)
    gen_feats = featurize_torsions(gen_atom14, aatype, sidechains=True,
                                   cossin=False)
    ref_feats = featurize_torsions(
        np.asarray(arr, np.float32), seqres[0], sidechains=True, cossin=False
    )
    jsds = [
        hist_jsd(ref_feats[:, i], gen_feats[:, i], bins=30)
        for i in range(ref_feats.shape[1])
    ]
    print(f"torsion JSDs: mean {np.mean(jsds):.4f} max {np.max(jsds):.4f}")
    print("E2E SMOKE OK")


if __name__ == "__main__":
    main()

"""Training entry point (reference-flag-compatible).

Rebuild of the reference trainer (reference `mdgen/train.py:1-77`) without
Lightning: explicit epoch loop, jitted train/val steps on a (dp, tp) device
mesh, EMA-swapped validation, designability probe, Orbax checkpoints.

Example (4AA forward simulation):
  python train.py --sim_condition --train_split splits/4AA_train.csv \
      --val_split splits/4AA_val.csv --data_dir data/4AA_sims --num_frames 1000 \
      --prepend_ipa --abs_pos_emb --abs_time_emb --crop 4 --epochs 10000 \
      --run_name my_run
"""
import argparse
import os
import signal
import time

import jax
import numpy as np

from mdgen_tpu.config import add_model_args, config_from_args
from mdgen_tpu.data import Loader, MDGenDataset
from mdgen_tpu.parallel import (
    global_batch_from_local,
    init_distributed,
    make_global_mesh,
    shard_batch,
)
from mdgen_tpu.protein import atom14_to_pdb
from mdgen_tpu.runtime import GracefulStop, MDGenRuntime, MetricLogger, checkpoint


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--validate", action="store_true")
    parser.add_argument("--num_workers", type=int, default=4)  # unused (device tokenization)
    parser.add_argument("--train_split", type=str, required=True)
    parser.add_argument("--val_split", type=str, required=True)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--run_name", type=str, default="default")
    parser.add_argument("--print_freq", type=int, default=100)
    parser.add_argument("--ckpt_freq", type=int, default=1)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--train_batches", type=int, default=None)
    parser.add_argument("--val_batches", type=int, default=None)
    parser.add_argument("--val_repeat", type=int, default=1)
    parser.add_argument("--val_freq", type=int, default=None,
                        help="also validate every N train steps")
    parser.add_argument("--val_epoch_freq", type=int, default=1)
    parser.add_argument("--no_validate", action="store_true")
    parser.add_argument("--designability_freq", type=int, default=1)
    parser.add_argument("--inference_batches", type=int, default=0)
    parser.add_argument("--seed", type=int, default=137)
    parser.add_argument("--check_grad", action="store_true",
                        help="after the first step, warn about parameters "
                             "with zero gradient")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler trace of N steps "
                             "(starting at step 10) into MODEL_DIR/trace")
    parser.add_argument("--stop_check_freq", type=int, default=20,
                        help="poll for SIGTERM / MODEL_DIR/STOP every N "
                             "steps; on stop, save a checkpoint and exit 0 "
                             "(0 or negative disables polling)")
    parser.add_argument("--keep_ckpts", type=int, default=3,
                        help="retain only the newest N step_* checkpoints "
                             "(pruned at each save; 0 = keep all)")
    # multi-host (DCN): on TPU pod slices all three are auto-detected, so
    # just launching one process per host works with no flags
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    add_model_args(parser)
    return parser.parse_args()


def main():
    args = parse_args()
    init_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    procs, proc_id = jax.process_count(), jax.process_index()

    os.environ["MODEL_DIR"] = model_dir = os.path.join("workdir", args.run_name)
    os.makedirs(model_dir, exist_ok=True)
    cfg = config_from_args(args)

    logger = MetricLogger(
        model_dir=model_dir, use_wandb=args.wandb and proc_id == 0
    )
    log = logger.logger
    log.info(f"devices: {jax.device_count()} ({procs} processes)")
    log.info(f"config: {cfg.to_json()}")

    n_dev = jax.device_count()
    mesh = (
        make_global_mesh(cfg.dp_size, cfg.tp_size, cfg.sp_size)
        if n_dev > 1 else None
    )
    rt = MDGenRuntime(cfg, mesh=mesh)

    def put_batch(b):
        """Host batch -> device-sharded global batch."""
        if procs > 1:
            return global_batch_from_local(mesh, b)
        return shard_batch(mesh, b)

    trainset = MDGenDataset(cfg, args.train_split, args.data_dir)
    if cfg.overfit:
        valset = trainset
    else:
        valset = MDGenDataset(cfg, args.val_split, args.data_dir, repeat=args.val_repeat)

    train_loader = Loader(
        trainset, cfg.batch_size, shuffle=True, seed=args.seed,
        max_batches=args.train_batches, num_shards=procs, shard_id=proc_id,
    )
    val_loader = Loader(
        valset, cfg.batch_size, shuffle=False, seed=args.seed,
        max_batches=args.val_batches, num_shards=procs, shard_id=proc_id,
    )

    rng = jax.random.PRNGKey(args.seed)
    example = next(iter(train_loader))
    example.pop("name", None)
    state = rt.init(rng, put_batch(example))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    log.info(f"model parameters: {n_params:,}")

    start_epoch = 0
    if args.ckpt:
        state, step = checkpoint.load_checkpoint(args.ckpt, state)
        # resume the epoch schedule (the reference resumes via Lightning's
        # ckpt_path, `train.py:77`); epochs are derived from the restored
        # step so the checkpoint needs no extra field
        steps_per_epoch = max(len(train_loader), 1)
        start_epoch = step // steps_per_epoch
        log.info(
            f"restored checkpoint at step {step} "
            f"(resuming at epoch {start_epoch})"
        )

    check_grad_pending = args.check_grad

    def run_validation(epoch):
        eval_params = rt.eval_params(state)
        for batch_idx, batch in enumerate(val_loader):
            names = batch.pop("name")
            batch = put_batch(batch)
            key = jax.random.fold_in(rng, 10_000_000 + epoch * 10000 + batch_idx)
            metrics = rt.val_step(eval_params, batch, key)
            logger.log_dict({k: np.asarray(v) for k, v in metrics.items()}, "val")

            do_design = (
                batch_idx < args.inference_batches
                and ((epoch + 1) % args.designability_freq == 0 or args.validate)
            )
            if do_design:
                from mdgen_tpu.geometry.constants import aatype_to_str_sequence

                atom14, aa_out = rt.inference(eval_params, batch, key)
                if procs > 1:
                    # dp shards live on other hosts; np.asarray needs them all
                    from jax.experimental import multihost_utils

                    atom14, aa_out, seqres = multihost_utils.process_allgather(
                        (atom14, aa_out, batch["seqres"]), tiled=True
                    )
                    batch = dict(batch, seqres=seqres)
                seq = np.asarray(batch["seqres"])
                rec = np.asarray(aa_out) == seq[:, None, :]
                logger.log("design_aa_recovery", float(rec[:, :, 1:-1].mean()), "val")
                logger.log(
                    "cond_aa_recovery",
                    float(np.concatenate([rec[:, :, :1], rec[:, :, -1:]], 2).mean()),
                    "val",
                )
                log.info(
                    "seq_pred="
                    + ",".join(aatype_to_str_sequence(a) for a in np.asarray(aa_out)[:, 0])
                    + " seq_true="
                    + ",".join(aatype_to_str_sequence(a) for a in seq)
                )
                path = os.path.join(model_dir, f"epoch{epoch}_{names[0]}.pdb")
                atom14_to_pdb(np.asarray(atom14[0]), seq[0], path)
        logger.flush("val", epoch=epoch, step=int(state.step), save=True)

    if args.validate:
        run_validation(0)
        return

    stopper = GracefulStop(os.path.join(model_dir, "STOP"))
    if proc_id == 0:
        # a sentinel consumed by a previous graceful stop would otherwise
        # latch and make this (resumed) run silently stop within one poll
        # interval; a sentinel NEWER than every checkpoint is a pre-queued
        # stop request for this run and stays honored
        if stopper.clear_sentinel(model_dir):
            log.warning("removed stale STOP sentinel from a previous run")
        elif os.path.exists(stopper.sentinel_path):
            log.warning("pre-queued STOP sentinel present: this run will "
                        "checkpoint and exit within --stop_check_freq steps")

    def stop_requested(step):
        # polled at a fixed step cadence so all dp processes agree on the
        # exit step; process 0's observation is authoritative
        if args.stop_check_freq <= 0:  # 0 = polling disabled
            return False
        if step % args.stop_check_freq != 0:
            return False
        local = stopper.poll()
        if procs == 1:
            return local
        from jax.experimental import multihost_utils

        return bool(
            multihost_utils.broadcast_one_to_all(
                np.asarray(local if proc_id == 0 else False)
            )
        )

    step_times = []
    stopped = False
    for epoch in range(start_epoch, cfg.epochs):
        for batch in train_loader:
            batch.pop("name", None)
            batch = put_batch(batch)
            key = jax.random.fold_in(rng, int(state.step))
            t0 = time.time()
            step_now = int(state.step)
            if args.profile_steps and step_now == 10:
                jax.profiler.start_trace(os.path.join(model_dir, "trace"))
            state, metrics = rt.train_step(state, batch, key)
            if check_grad_pending and int(state.step) >= 2:
                # after >=1 optimizer step the adaLN-zero gates are nonzero,
                # so every live parameter should now receive gradient
                norms = rt.grad_report(state, batch, key)
                dead = [k for k, v in norms.items() if v == 0.0]
                for k in dead:
                    log.warning(f"param {k} has no grad")
                log.info(f"check_grad: {len(dead)}/{len(norms)} zero-grad params")
                check_grad_pending = False
            if args.profile_steps and step_now == 10 + args.profile_steps:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                log.info(f"profiler trace written to {model_dir}/trace")
            if int(state.step) % args.print_freq == 0:
                jax.block_until_ready(metrics["loss"])
                step_times.append(time.time() - t0)
                logger.log_dict({k: np.asarray(v) for k, v in metrics.items()}, "train")
                logger.log("dur", step_times[-1], "train")
                logger.flush("iter", epoch=epoch, step=int(state.step))
            else:
                logger.log_dict({k: np.asarray(v) for k, v in metrics.items()}, "train")
            if args.val_freq and int(state.step) % args.val_freq == 0:
                run_validation(epoch)
            if stop_requested(int(state.step)):
                stopped = True
                break
        if stopped:
            logger.flush("train", epoch=epoch, step=int(state.step), save=True)
            log.info(
                "graceful stop (SIGTERM or STOP sentinel) at step "
                f"{int(state.step)}; saving final checkpoint"
            )
            break

        logger.flush("train", epoch=epoch, step=int(state.step), save=True)
        if not args.no_validate and (epoch + 1) % args.val_epoch_freq == 0:
            run_validation(epoch)
        if (epoch + 1) % args.ckpt_freq == 0 and proc_id == 0:
            # state is replicated/fully addressable from process 0's view for
            # dp-sharded training; a single writer avoids the same-path race
            # the per-process save would create on shared filesystems
            path = checkpoint.save_checkpoint(
                model_dir, state, cfg, int(state.step),
                keep_last_n=args.keep_ckpts,
            )
            log.info(f"saved checkpoint: {path}")

    if proc_id == 0:
        checkpoint.save_checkpoint(
            model_dir, state, cfg, int(state.step), keep_last_n=args.keep_ckpts
        )


if __name__ == "__main__":
    main()

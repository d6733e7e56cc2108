"""Convert a reference (PyTorch-Lightning) MDGen checkpoint into a native
mdgen_tpu checkpoint directory.

A reference user switches over with one command:

    python tools/port_checkpoint.py --ckpt epoch=313-step=704999.ckpt \
        --out workdir/ported_sim

and every inference CLI then runs on it directly
(``sim_inference.py --sim_ckpt workdir/ported_sim`` etc.) — the output is a
standard self-describing checkpoint dir: ``config.json`` + an Orbax
``step_{N}`` tree holding {params, EMA params, optimizer state, step}.

What it reads (the Lightning checkpoint contract, reference
`mdgen/wrapper.py:50,107-130`, `mdgen/train.py:57-77`):
  * ``hyper_parameters.args`` — the argparse namespace stored by
    ``save_hyperparameters()``; flag names match ``MDGenConfig`` fields by
    construction, so the model/task config ports 1:1.
  * ``state_dict`` — wrapper parameters under the ``model.`` prefix; mapped
    onto the fused flax layout by
    ``mdgen_tpu.interop.port_reference_state_dict`` (golden forward/loss
    parity in tests/test_model_golden.py).
  * ``ema`` — OpenFold-style EMA state ``{"params": <raw model keys>,
    "decay": f}`` written by ``on_save_checkpoint`` when ``--ema``
    (reference `mdgen/ema.py:65-72`); ported the same way so
    ``--no_ema``-less inference uses the EMA weights exactly as the
    reference's ``load_ema_weights`` does.
  * ``global_step`` — preserved as the checkpoint step.

The optimizer state is freshly initialized (torch Adam moments do not map
onto optax trees); training resumed from a ported checkpoint restarts the
moments, which matches the usual practice of porting for *inference*.

Hyena checkpoints cannot be ported (no public reference Hyena weights exist
to define the mapping; ``interop.py`` raises) — train natively instead.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PRECISION_MAP = {
    # Lightning precision strings -> this framework's two modes
    "32-true": "32-true", "32": "32-true", "64-true": "32-true",
    "64": "32-true",
    "bf16-mixed": "bf16-mixed", "bf16-true": "bf16-mixed",
    "16-mixed": "bf16-mixed", "16-true": "bf16-mixed", "16": "bf16-mixed",
}


def port_lightning_checkpoint(ckpt_path: str, out_dir: str,
                              precision: str | None = None,
                              step: int | None = None) -> str:
    """Port one Lightning .ckpt file -> mdgen_tpu checkpoint dir.

    Returns the written ``step_{N}`` path. Pure function of the inputs; the
    CLI below is a thin wrapper.
    """
    import torch  # torch-cpu: only needed to deserialize the checkpoint

    import jax.numpy as jnp

    from mdgen_tpu.config import config_from_args
    from mdgen_tpu.interop import port_reference_state_dict
    from mdgen_tpu.runtime import checkpoint as ckpt_io
    from mdgen_tpu.runtime.wrapper import MDGenRuntime, TrainState

    # weights_only=False: hyper_parameters holds an argparse.Namespace
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    args = ckpt["hyper_parameters"]["args"]
    cfg = config_from_args(args)
    lightning_prec = getattr(args, "precision", "32-true")
    cfg = cfg.replace(
        precision=precision or PRECISION_MAP.get(str(lightning_prec),
                                                 "32-true")
    )

    sd = {
        k[len("model."):]: v
        for k, v in ckpt["state_dict"].items()
        if k.startswith("model.")
    }
    params = port_reference_state_dict(sd, cfg, cfg.latent_dim)

    ema_params = None
    if cfg.ema:
        if "ema" not in ckpt:
            raise ValueError(
                f"{ckpt_path}: config says --ema but no 'ema' entry in the "
                "checkpoint (reference on_save_checkpoint always writes it)"
            )
        ema_params = port_reference_state_dict(
            ckpt["ema"]["params"], cfg, cfg.latent_dim
        )

    rt = MDGenRuntime(cfg)  # for the optimizer definition only
    state = TrainState(
        step=jnp.asarray(
            step if step is not None else ckpt.get("global_step", 0),
            jnp.int32,
        ),
        params=params,
        opt_state=rt.tx.init(params),
        ema_params=ema_params,
    )
    return ckpt_io.save_checkpoint(out_dir, state, cfg, int(state.step))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", required=True,
                   help="reference Lightning .ckpt file")
    p.add_argument("--out", required=True,
                   help="output checkpoint directory (config.json + step_N)")
    p.add_argument("--precision", choices=["32-true", "bf16-mixed"],
                   default=None,
                   help="override serving precision (default: mapped from "
                        "the checkpoint's Lightning precision string)")
    p.add_argument("--step", type=int, default=None,
                   help="override the stored step (default: global_step)")
    args = p.parse_args(argv)
    path = port_lightning_checkpoint(
        args.ckpt, args.out, precision=args.precision, step=args.step
    )
    print(f"ported {args.ckpt} -> {path}")


if __name__ == "__main__":
    main()

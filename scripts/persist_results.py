"""Persist quality-run artifacts into results/ (auditable across rounds).

Sandbox wipes erase /tmp datasets and workdir/ checkpoints between rounds,
so BENCH.md claims become unverifiable (round-3 lesson: the TPS pickle and
eval summaries vanished). This copies the SMALL analysis outputs (pickles,
JSONs, PDFs — never checkpoints or trajectories) into results/r{N}_{task}/
plus a summary.json recording the command provenance.

    python scripts/persist_results.py --round 4 --task design \
        --src /tmp/quality_r3_design/samples --note "34M, 30k steps" \
        --cmd "scripts/quality_run.py --task design ..."
"""
import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# analysis artifacts worth keeping; everything else (npy trajectories,
# xtc, checkpoints) is bulk data that stays out of git
KEEP_EXT = (".pkl", ".json", ".pdf", ".csv", ".txt")
MAX_BYTES = 5 * 1024 * 1024  # per-file cap


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--task", type=str, required=True)
    p.add_argument("--src", type=str, required=True,
                   help="dir holding the analysis outputs")
    p.add_argument("--note", type=str, default="")
    p.add_argument("--cmd", type=str, default="",
                   help="the command that produced the artifacts")
    args = p.parse_args()

    dst = os.path.join(REPO, "results", f"r{args.round}_{args.task}")
    os.makedirs(dst, exist_ok=True)
    copied, skipped = [], []
    for f in sorted(os.listdir(args.src)):
        path = os.path.join(args.src, f)
        if not os.path.isfile(path) or not f.endswith(KEEP_EXT):
            continue
        if os.path.getsize(path) > MAX_BYTES:
            skipped.append(f)
            continue
        shutil.copy2(path, os.path.join(dst, f))
        copied.append(f)

    summary = {
        "round": args.round,
        "task": args.task,
        "source": args.src,
        "command": args.cmd,
        "note": args.note,
        "files": copied,
        "skipped_oversize": skipped,
    }
    with open(os.path.join(dst, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"persisted {len(copied)} files -> {dst}"
          + (f" (skipped oversize: {skipped})" if skipped else ""))


if __name__ == "__main__":
    main()

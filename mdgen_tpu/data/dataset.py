"""Trajectory dataset over preprocessed atom14 ``.npy`` memmaps.

Same on-disk contract as the reference (reference `mdgen/dataset.py:8-100`):
``{data_dir}/{name}{suffix}.npy`` float16 atom14 coordinates in Angstroms,
split CSVs with ``name,seqres`` columns, ATLAS replicas ``_R1..3``, the full
set of overfit/debug flags, and ATLAS-mode random crop / pad to ``crop``.

TPU-first difference: items are RAW atom14 windows (float32) + sequence +
mask. Tokenization (frames/torsions) runs on-device inside the jitted train
step (``runtime.wrapper.tokenize_atom14``), so the host does no per-item
math. In ATLAS mode, items carry one extra left-context residue column
(width ``crop + 1``) that the tokenizer consumes for the first residue's
phi/omega and then drops.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..config import MDGenConfig
from ..geometry import constants as rc


def _prepend_ctx_pad(cfg, atom14, seqres_idx, mask):
    """Prepend an all-zero, mask-0 left-context column (chain start)."""
    atom14 = np.concatenate(
        [np.zeros((cfg.num_frames, 1, 14, 3), atom14.dtype), atom14], axis=1
    )
    seqres_idx = np.concatenate([np.zeros(1, seqres_idx.dtype), seqres_idx])
    mask = np.concatenate([np.zeros(1, np.float32), mask])
    return atom14, seqres_idx, mask


class MDGenDataset:
    def __init__(self, cfg: MDGenConfig, split: str, data_dir: str, repeat: int = 1):
        self.cfg = cfg
        self.df = pd.read_csv(split, index_col="name")
        self.data_dir = data_dir
        self.repeat = repeat
        self.rng = np.random.default_rng()

    def __len__(self):
        if self.cfg.overfit_peptide:
            return 1000
        return self.repeat * len(self.df)

    def __getitem__(self, idx: int) -> dict:
        cfg = self.cfg
        idx = idx % len(self.df)
        if cfg.overfit:
            idx = 0

        if cfg.overfit_peptide is None:
            name = self.df.index[idx]
            seqres = self.df.seqres[name]
        else:
            name = cfg.overfit_peptide
            seqres = name

        if cfg.atlas:
            rep = self.rng.integers(1, 4)
            full_name = f"{name}_R{rep}"
        else:
            full_name = name

        arr = np.lib.format.open_memmap(
            os.path.join(self.data_dir, f"{full_name}{cfg.suffix}.npy"), "r"
        )
        if cfg.frame_interval:
            arr = arr[:: cfg.frame_interval]

        # trajectories of exactly num_frames are allowed (window start 0);
        # matches reference `mdgen/dataset.py:40` intent without its crash
        span = arr.shape[0] - cfg.num_frames
        frame_start = self.rng.integers(0, span) if span > 0 else 0
        if cfg.overfit_frame:
            frame_start = 0
        # ship float32: the on-disk contract is already fp16 (so this is an
        # exact widening for reference-prepped data), and float32 .npy inputs
        # must not pick up quantization noise the reference pipeline lacks
        atom14 = np.array(
            arr[frame_start : frame_start + cfg.num_frames], dtype=np.float32
        )
        if cfg.copy_frames:
            atom14[1:] = atom14[0]

        seqres_idx = rc.str_sequence_to_aatype(seqres)
        L = atom14.shape[1]
        mask = np.ones(L, dtype=np.float32)

        if cfg.atlas:
            # Random-crop or pad to ``crop``, PLUS one residue of left
            # context (prepended column, dropped after on-device
            # tokenization): the reference tokenizes the full chain before
            # cropping (reference `mdgen/dataset.py:50-89`), so the first
            # cropped residue keeps its phi/omega supervision — which need
            # the previous residue's atoms. Items are [crop + 1] wide;
            # column 0 has mask 0 when no real context exists (chain start).
            if L > cfg.crop:
                start = self.rng.integers(0, L - cfg.crop + 1)
                lo = max(start - 1, 0)
                atom14 = atom14[:, lo : start + cfg.crop]
                seqres_idx = seqres_idx[lo : start + cfg.crop]
                mask = mask[lo : start + cfg.crop].copy()
                if start == 0:  # no left context: prepend a masked column
                    atom14, seqres_idx, mask = _prepend_ctx_pad(
                        cfg, atom14, seqres_idx, mask
                    )
            else:
                if L < cfg.crop:
                    pad = cfg.crop - L
                    atom14 = np.concatenate(
                        [atom14, np.zeros((cfg.num_frames, pad, 14, 3),
                                          atom14.dtype)],
                        axis=1,
                    )
                    seqres_idx = np.concatenate(
                        [seqres_idx, np.zeros(pad, seqres_idx.dtype)]
                    )
                    mask = np.concatenate([mask, np.zeros(pad, np.float32)])
                atom14, seqres_idx, mask = _prepend_ctx_pad(
                    cfg, atom14, seqres_idx, mask
                )

        return {
            "name": full_name,
            "frame_start": int(frame_start),
            "atom14": atom14,
            "seqres": seqres_idx,
            "mask": mask,
        }

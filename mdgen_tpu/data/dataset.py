"""Trajectory dataset over preprocessed atom14 ``.npy`` memmaps.

Same on-disk contract as the reference (reference `mdgen/dataset.py:8-100`):
``{data_dir}/{name}{suffix}.npy`` float16 atom14 coordinates in Angstroms,
split CSVs with ``name,seqres`` columns, ATLAS replicas ``_R1..3``, the full
set of overfit/debug flags, and ATLAS-mode random crop / pad to ``crop``.

TPU-first difference: items are RAW atom14 windows (fp16) + sequence + mask.
Tokenization (frames/torsions) runs on-device inside the jitted train step
(``runtime.wrapper.tokenize_atom14``), so the host does no per-item math and
ships half the bytes.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..config import MDGenConfig
from ..geometry import constants as rc


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

        frame_start = self.rng.integers(0, arr.shape[0] - cfg.num_frames)
        if cfg.overfit_frame:
            frame_start = 0
        atom14 = np.array(
            arr[frame_start : frame_start + cfg.num_frames], dtype=np.float16
        )
        if cfg.copy_frames:
            atom14[1:] = atom14[0]

        seqres_idx = rc.str_sequence_to_aatype(seqres)
        L = atom14.shape[1]
        mask = np.ones(L, dtype=np.float32)

        if cfg.atlas:
            if L > cfg.crop:
                start = self.rng.integers(0, L - cfg.crop + 1)
                atom14 = atom14[:, start : start + cfg.crop]
                seqres_idx = seqres_idx[start : start + cfg.crop]
                mask = mask[start : start + cfg.crop]
            elif L < cfg.crop:
                pad = cfg.crop - L
                atom14 = np.concatenate(
                    [atom14, np.zeros((cfg.num_frames, pad, 14, 3), np.float16)],
                    axis=1,
                )
                seqres_idx = np.concatenate([seqres_idx, np.zeros(pad, np.int32)])
                mask = np.concatenate([mask, np.zeros(pad, np.float32)])

        return {
            "name": full_name,
            "frame_start": int(frame_start),
            "atom14": atom14,
            "seqres": seqres_idx,
            "mask": mask,
        }

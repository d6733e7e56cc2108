"""Data layer: memmap trajectory datasets, loaders, synthetic generators."""
from .dataset import MDGenDataset  # noqa: F401
from .loader import Loader  # noqa: F401
from .synthetic import (  # noqa: F401
    synthetic_rotamer_trajectory,
    synthetic_trajectory,
    write_synthetic_dataset,
)

"""Data layer: memmap trajectory datasets, loaders, synthetic generators."""
from .dataset import MDGenDataset  # noqa: F401
from .loader import Loader  # noqa: F401
from .synthetic import synthetic_trajectory, write_synthetic_dataset  # noqa: F401

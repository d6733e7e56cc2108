"""Runtime: train state, jitted steps, checkpointing, metrics, inference."""
from .wrapper import MDGenRuntime, TrainState, tokenize_atom14  # noqa: F401
from .metrics import MetricLogger, get_logger  # noqa: F401
from . import checkpoint  # noqa: F401
from .preempt import GracefulStop  # noqa: F401

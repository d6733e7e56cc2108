"""Transport layer: interpolant paths, flow-matching losses, samplers."""
from .paths import GVPPlan, LinearPlan, VPPlan, make_plan  # noqa: F401
from .transport import (  # noqa: F401
    Sampler,
    Transport,
    TransportConfig,
    create_transport,
    mean_flat,
    t_to_alpha,
)
from .dirichlet import DirichletConditionalFlow, simplex_proj  # noqa: F401
from . import integrators  # noqa: F401

"""mdgen_tpu: TPU-native generative modeling of molecular dynamics trajectories.

A ground-up JAX/XLA/Pallas framework with the capabilities of MDGen
(arXiv 2409.17808): forward simulation, transition path sampling, trajectory
upsampling, and inpainting/design of peptide MD trajectories via stochastic
interpolant flow matching over SE(3)-tokenized latents.
"""

__version__ = "0.1.0"

# Honor the JAX_PLATFORMS env contract. Some PJRT plugins (the experimental
# axon TPU tunnel in this image) register themselves as the preferred
# platform regardless of the env var, so a process that sets
# JAX_PLATFORMS=cpu to stay off the (single-client) TPU still binds it —
# and two concurrent TPU clients deadlock the tunnel. Pinning the live jax
# config before backend init makes the env var authoritative again; on
# normal builds this is a no-op (config already mirrors the env).
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backend already initialized: leave it alone
        pass

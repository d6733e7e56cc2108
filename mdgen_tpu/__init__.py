"""mdgen_tpu: TPU-native generative modeling of molecular dynamics trajectories.

A ground-up JAX/XLA/Pallas framework with the capabilities of MDGen
(arXiv 2409.17808): forward simulation, transition path sampling, trajectory
upsampling, and inpainting/design of peptide MD trajectories via stochastic
interpolant flow matching over SE(3)-tokenized latents.
"""

__version__ = "0.1.0"

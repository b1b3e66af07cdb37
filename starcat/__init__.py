"""starcat — TPU-native probabilistic cataloging inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`jaekor91/HMC-stellar-toy-model` (see SURVEY.md): Poisson-likelihood
PSF-convolved scene model, sampled with HMC / RHMC / NUTS / SMC / ADVI heads
that share one potential, vmapped over thousands of chains and sharded over
TPU device meshes.
"""

from .scene import SceneSpec, render_scene, make_mock_image, pixel_centers  # noqa: F401
from .potential import (  # noqa: F401
    PriorSpec,
    constrain,
    unconstrain,
    log_prior,
    log_likelihood,
    make_potential,
    make_potential_and_grad,
    sample_prior,
)

__version__ = "0.1.0"

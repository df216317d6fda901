"""dmip_tpu — TPU-native diffusion modelling for Bayesian inverse problems.

A from-scratch JAX/XLA framework with the capabilities of the reference
PyTorch codebase maffos/Diffusion-Modelling-for-inverse-problems: score-based
diffusion posterior estimators (CDE, CDiffE, DPS), Score-Fokker-Planck /
PINN losses, SNF + INN flow baselines, two benchmark inverse problems,
MCMC ground-truth generation, evaluation + grid-search infrastructure.

Everything on the compute path is pure-functional JAX: shape-static, jitted,
scan-based, explicitly keyed PRNG, shardable over a device mesh.
"""

from . import (
    data,
    evaluate,
    losses,
    mcmc,
    nets,
    samplers,
    sde,
    train,
)
from .sde import ReverseSDE, VPSDE

__version__ = "0.1.0"

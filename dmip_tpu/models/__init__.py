from .diffusion import (
    CDE,
    CDiffE,
    DiffusionModel,
    LossConfig,
    PosteriorDiffusionEstimator,
)

from .diffusion import (
    CDE,
    AnalyticGuidanceDPS,
    CDiffE,
    DiffusionModel,
    LossConfig,
    PosteriorDiffusionEstimator,
)
from .refined import EnergyRefinedModel

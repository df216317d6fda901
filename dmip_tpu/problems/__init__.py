from .linear import LinearForwardProblem
from . import scatterometry

"""Linear operators: noise, forward model, batched CG."""

from .noise import NoiseModel
from .model import SkyModel, with_cut_decomposition
from .cg import cg_solve, CGInfo

__all__ = ["NoiseModel", "SkyModel", "with_cut_decomposition",
           "cg_solve", "CGInfo"]

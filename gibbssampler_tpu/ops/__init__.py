"""Linear operators: noise, forward model, batched CG."""

from .noise import NoiseModel
from .model import SkyModel
from .cg import cg_solve, CGInfo

__all__ = ["NoiseModel", "SkyModel", "cg_solve", "CGInfo"]

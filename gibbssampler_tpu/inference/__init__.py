"""Experiment layer: simulation, configuration, runners, checkpoints."""

from .simulate import example_dl, synfast, simulate_dataset

__all__ = ["example_dl", "synfast", "simulate_dataset"]

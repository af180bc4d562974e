"""Shared utilities."""

from .pytree import register_arrays_pytree

__all__ = ["register_arrays_pytree"]

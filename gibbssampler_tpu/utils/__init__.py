"""Shared utilities."""

from .pytree import register_arrays_pytree
from .exec_cache import cached_call, cache_enabled

__all__ = ["register_arrays_pytree", "cached_call", "cache_enabled"]

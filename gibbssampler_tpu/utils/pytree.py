"""Pytree registration helpers.

Every operator-holding object (SHT, HealpixSHT, NoiseModel, SkyModel, the
Gibbs schemes) is registered as a JAX pytree whose children are its device
arrays.  Jitted entry points then take the scheme *as an argument*, so the
operator tables (up to GBs at production lmax) are runtime parameters — not
constants baked into the lowered module (which would be re-uploaded through
the compile pipeline on every trace).
"""

from __future__ import annotations

import jax

__all__ = ["register_arrays_pytree"]


def register_arrays_pytree(cls, array_fields, static_fields):
    """Register ``cls`` as a pytree: ``array_fields`` attribute names become
    children (arrays / sub-pytrees; may be None), ``static_fields`` become
    hashable aux data.  Unflatten rebuilds via __new__ + setattr and then
    calls ``obj._rebind()`` if defined (to reconstruct derived closures)."""

    def flatten(obj):
        children = tuple(getattr(obj, f) for f in array_fields)
        aux = tuple(getattr(obj, f) for f in static_fields)
        return children, aux

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for f, v in zip(array_fields, children):
            object.__setattr__(obj, f, v)
        for f, v in zip(static_fields, aux):
            object.__setattr__(obj, f, v)
        rebind = getattr(obj, "_rebind", None)
        if rebind is not None:
            rebind()
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls

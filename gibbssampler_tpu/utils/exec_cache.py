"""Persistent compiled-executable cache.

The axon TPU backend compiles through a remote tunnel (seconds per
executable, minutes for the full Gibbs step) and ignores JAX's persistent
compilation cache.  ``jax.experimental.serialize_executable`` does work on
it, so this module caches *compiled executables* on disk keyed by

    (package source hash, user key, input avals, pytree structure)

The pytree structure string covers all static configuration (bins, blocks,
cr_method, ...) because those live in the schemes' aux data.  Enabled by
default; set GS_EXEC_CACHE=0 to disable (e.g. when bisecting compiler
issues).
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import pickle
import sys

import jax

__all__ = ["cached_call", "cache_enabled"]

_SRC_HASH = None


def cache_enabled() -> bool:
    return os.environ.get("GS_EXEC_CACHE", "1") != "0"


def _src_hash() -> str:
    """Hash of every package source file — stale caches die on code change."""
    global _SRC_HASH
    if _SRC_HASH is None:
        h = hashlib.sha1()
        root = pathlib.Path(__file__).resolve().parents[1]
        for f in sorted(root.rglob("*.py")):
            h.update(f.read_bytes())
        h.update(jax.__version__.encode())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _cache_dir() -> pathlib.Path:
    d = pathlib.Path(os.environ.get("XDG_CACHE_HOME",
                                    os.path.expanduser("~/.cache")))
    d = d / "gibbssampler_tpu" / "executables"
    d.mkdir(parents=True, exist_ok=True)
    return d


_loaded = {}


def cached_call(jitted, key: str, *args):
    """Call ``jitted(*args)`` through a disk-cached compiled executable.

    ``jitted`` must be a jax.jit-wrapped callable; args are the (pytree)
    call arguments.  Falls back to a plain call if anything about
    serialization fails (e.g. an unsupported backend)."""
    if not cache_enabled() or (jax.default_backend() == "cpu"
                               and os.environ.get("GS_EXEC_CACHE") != "force"):
        # CPU AOT results may embed machine features the execution host
        # lacks (observed SIGSEGV on reload); CPU compiles are cheap, so
        # the cache is TPU-only (GS_EXEC_CACHE=force overrides, for tests)
        return jitted(*args)
    from jax.experimental import serialize_executable as se

    flat, treedef = jax.tree.flatten(args)
    h = hashlib.sha1()
    h.update(_src_hash().encode())
    h.update(key.encode())
    h.update(str(treedef).encode())
    for leaf in flat:
        h.update(str(jax.typeof(leaf) if hasattr(jax, "typeof")
                     else (getattr(leaf, "shape", None),
                           getattr(leaf, "dtype", None))).encode())
    digest = h.hexdigest()[:24]
    if digest in _loaded:
        return _loaded[digest](*args)

    path = _cache_dir() / f"{key}_{digest}.pkl"
    try:
        if path.exists():
            payload, in_tree, out_tree = pickle.loads(path.read_bytes())
            compiled = se.deserialize_and_load(payload, in_tree, out_tree)
            _loaded[digest] = compiled
            return compiled(*args)
    except Exception as e:  # stale/corrupt/other-topology cache entry
        print(f"exec_cache: reload failed ({e}); recompiling",
              file=sys.stderr)
        try:
            path.unlink()
        except OSError:
            pass

    try:
        compiled = jitted.lower(*args).compile()
        payload = pickle.dumps(se.serialize(compiled))
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(payload)
        os.replace(tmp, path)
        _loaded[digest] = compiled
        return compiled(*args)
    except Exception as e:
        print(f"exec_cache: serialize path failed ({e}); plain call",
              file=sys.stderr)
        return jitted(*args)

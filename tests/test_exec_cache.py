"""Compiled-executable disk cache (utils/exec_cache)."""

import os
import numpy as np
import jax
import jax.numpy as jnp

from gibbssampler_tpu.utils import cached_call
from gibbssampler_tpu.utils import exec_cache


def test_cached_call_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.setenv("GS_EXEC_CACHE", "force")
    exec_cache._loaded.clear()

    calls = []

    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    x = jnp.arange(8.0)
    r1 = cached_call(f, "testf", x)
    np.testing.assert_allclose(np.asarray(r1), np.arange(8.0) * 2 + 1)
    files = list((tmp_path / "gibbssampler_tpu" / "executables").glob("*.pkl"))
    assert len(files) == 1
    # second call: in-memory hit
    r2 = cached_call(f, "testf", x)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1))
    # fresh process simulation: drop the in-memory map, reload from disk
    exec_cache._loaded.clear()
    r3 = cached_call(f, "testf", x)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(r1))
    # different shape => new entry
    y = jnp.arange(16.0)
    cached_call(f, "testf", y)
    files = list((tmp_path / "gibbssampler_tpu" / "executables").glob("*.pkl"))
    assert len(files) == 2


def test_cache_disable(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.setenv("GS_EXEC_CACHE", "0")

    @jax.jit
    def f(x):
        return x + 1

    r = cached_call(f, "off", jnp.ones(4))
    np.testing.assert_allclose(np.asarray(r), 2.0)
    assert not (tmp_path / "gibbssampler_tpu" / "executables").exists()


def test_corrupt_entry_recovers(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.setenv("GS_EXEC_CACHE", "force")
    exec_cache._loaded.clear()

    @jax.jit
    def f(x):
        return x - 3.0

    x = jnp.ones(4)
    cached_call(f, "g", x)
    files = list((tmp_path / "gibbssampler_tpu" / "executables").glob("*.pkl"))
    files[0].write_bytes(b"garbage")
    exec_cache._loaded.clear()
    r = cached_call(f, "g", x)
    np.testing.assert_allclose(np.asarray(r), -2.0)

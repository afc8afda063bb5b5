"""Persistent-XLA-cache dir is scoped per host CPU fingerprint."""

import os

from maestro_tpu.utils.cache import _cpu_fingerprint, jax_cache_dir


def test_fingerprint_stable_and_short():
    a, b = _cpu_fingerprint(), _cpu_fingerprint()
    assert a == b
    assert len(a) == 8 and all(c in "0123456789abcdef" for c in a)


def test_env_override_keeps_fingerprint_subdir(monkeypatch):
    monkeypatch.setenv("MAESTRO_JAX_CACHE_DIR", "/tmp/somewhere")
    d = jax_cache_dir()
    assert d.startswith("/tmp/somewhere" + os.sep)
    assert os.path.basename(d) == f"cpu-{_cpu_fingerprint()}"


def test_default_is_user_scoped(monkeypatch):
    monkeypatch.delenv("MAESTRO_JAX_CACHE_DIR", raising=False)
    d = jax_cache_dir()
    assert d.startswith(os.path.expanduser("~"))
    assert "maestro_tpu_jax" in d

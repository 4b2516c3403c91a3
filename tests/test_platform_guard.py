"""The chip-entry startup guard (utils/platform.py): transient PJRT
plugin-registration failures must respawn the process, not crash the
bench/CLI run; a live backend must be a no-op."""

import os
import sys

import pytest

from rusty_sr_tpu.utils import platform as plat


def test_noop_when_backend_lives():
    # conftest forces CPU — devices() succeeds, so nothing happens.
    plat.ensure_device_or_respawn()


def test_respawns_on_backend_init_failure(monkeypatch):
    import jax

    def boom():
        # the real flake signature (module docstring): ONLY this message
        # respawns; a generic "Unable to initialize backend" prefix is a
        # permanent error and must fail fast
        raise RuntimeError("Unable to initialize backend 'axon': Backend "
                           "'axon' is not in the list of known backends")

    calls = {}

    def fake_execve(exe, argv, env):
        calls["exe"] = exe
        calls["argv"] = argv
        calls["env"] = env

    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setattr(os, "execve", fake_execve)
    monkeypatch.delenv(plat._RETRY_ENV, raising=False)

    plat.ensure_device_or_respawn(sleep_s=0.0)
    assert calls["exe"] == sys.executable
    assert calls["argv"] == plat._respawn_argv()
    assert calls["env"][plat._RETRY_ENV] == "1"


def test_respawn_argv_preserves_module_launch():
    # Under `python -m pytest`, __main__ carries a module spec; the
    # respawn must re-run via -m (a plain script exec of the module's
    # file path breaks absolute imports).  Under a script launch the
    # spec is None and argv passes through verbatim.
    argv = plat._respawn_argv()
    spec = getattr(sys.modules.get("__main__"), "__spec__", None)
    if spec is not None and spec.name:
        assert argv[:2] == [sys.executable, "-m"]
        assert not argv[2].endswith(".__main__")
        assert argv[3:] == sys.argv[1:]
    else:
        assert argv == [sys.executable] + sys.argv


def test_reraises_non_transient_error_immediately(monkeypatch):
    import jax

    def boom():
        raise RuntimeError("something else entirely (bad config)")

    calls = []
    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setattr(os, "execve",
                        lambda *a: calls.append(a))
    monkeypatch.delenv(plat._RETRY_ENV, raising=False)
    with pytest.raises(RuntimeError, match="something else"):
        plat.ensure_device_or_respawn(sleep_s=0.0)
    assert not calls  # no respawn burned on a permanent error


def test_gives_up_after_max_retries(monkeypatch):
    import jax

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon': Backend "
                           "'axon' is not in the list of known backends")

    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setenv(plat._RETRY_ENV, "3")
    with pytest.raises(RuntimeError, match="after 3 respawns"):
        plat.ensure_device_or_respawn(max_retries=3, sleep_s=0.0)


def test_generic_init_failure_fails_fast(monkeypatch):
    """A permanent backend error carrying jax's generic 'Unable to
    initialize backend' prefix (auth failure, bad plugin path) must NOT
    respawn — pre-fix it burned ~60s of futile re-execs first."""
    import jax

    def boom():
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNKNOWN: tunnel auth "
            "failed")

    respawned = {}
    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setattr(os, "execve",
                        lambda *a: respawned.setdefault("yes", True))
    with pytest.raises(RuntimeError, match="tunnel auth failed"):
        plat.ensure_device_or_respawn(sleep_s=0.0)
    assert not respawned

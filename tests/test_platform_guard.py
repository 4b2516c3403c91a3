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
        raise RuntimeError("Unable to initialize backend 'axon': not known")

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
    assert calls["argv"] == [sys.executable] + sys.argv
    assert calls["env"][plat._RETRY_ENV] == "1"


def test_gives_up_after_max_retries(monkeypatch):
    import jax

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon': not known")

    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setenv(plat._RETRY_ENV, "3")
    with pytest.raises(RuntimeError, match="after 3 respawns"):
        plat.ensure_device_or_respawn(max_retries=3, sleep_s=0.0)

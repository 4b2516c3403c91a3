"""Device-backend startup guard.

On this host the TPU is reached through a PJRT plugin registered
per-process at interpreter startup (a site hook).  That registration
can fail transiently (the tunnel endpoint flakes); the hook swallows
the error so the interpreter still starts, and the FIRST
``jax.devices()`` then raises ``RuntimeError: Unable to initialize
backend 'axon': Backend 'axon' is not in the list of known backends``.
Registration cannot be retried in-process — the only recovery is a
fresh interpreter — so chip-entry scripts (bench.py, the CLI) guard
their startup with :func:`ensure_device_or_respawn`, which re-execs
the current script a bounded number of times before giving up.

The reference has no analogue (local CUDA never flakes this way); this
is tunnel-environment armor, kept out of the library hot path.
"""

from __future__ import annotations

import os
import sys
import time

_RETRY_ENV = "_RSR_PLATFORM_RETRY"

# The one failure registration flakes produce; anything else is a real
# configuration error and must surface immediately, not after 3 respawns.
# Matching the generic jax prefix "Unable to initialize backend" alone
# would drag permanent errors (auth failures, bad plugin paths) through
# ~60 s of futile respawns — only the known skipped-registration message
# qualifies as the flake.
_TRANSIENT_MARKERS = ("not in the list of known backends",)


def _respawn_argv() -> list:
    """argv for the re-exec, preserving ``python -m pkg.mod`` semantics.

    A plain ``[sys.executable] + sys.argv`` would re-run a ``-m`` launch
    as a script exec (sys.argv[0] is the module's file path), putting
    the package dir — not the cwd — on sys.path and breaking absolute
    imports.  When __main__ was loaded from a module spec, respawn with
    the same ``-m``.
    """
    spec = getattr(sys.modules.get("__main__"), "__spec__", None)
    if spec is not None and spec.name:
        mod = spec.name
        if mod.endswith(".__main__"):  # python -m pkg
            mod = mod[: -len(".__main__")]
        return [sys.executable, "-m", mod] + sys.argv[1:]
    return [sys.executable] + sys.argv


def ensure_device_or_respawn(max_retries: int = 3, sleep_s: float = 20.0):
    """Fail-fast check that a jax backend is live; re-exec on flake.

    Call at the TOP of a chip-entry script (after arg parsing is fine —
    the argv is preserved across the exec, including ``python -m``
    launches).  No-op when the backend initialises (including CPU-forced
    test runs).  On the known transient plugin-registration failure,
    sleeps and replaces this process with a fresh interpreter (same
    argv/env + retry counter); after ``max_retries`` respawns — or on
    any error that is not the known flake — the error propagates.
    """
    import jax

    try:
        jax.devices()
        return
    except RuntimeError as e:
        if not any(m in str(e) for m in _TRANSIENT_MARKERS):
            raise  # permanent misconfiguration: fail fast
        tries = int(os.environ.get(_RETRY_ENV, "0"))
        if tries >= max_retries:
            raise RuntimeError(
                f"device backend still unavailable after {tries} "
                f"respawns: {e}") from e
        print(f"[rusty_sr_tpu] backend init failed ({e}); "
              f"respawning in {sleep_s:.0f}s "
              f"(retry {tries + 1}/{max_retries})", file=sys.stderr)
        time.sleep(sleep_s)
        env = dict(os.environ)
        env[_RETRY_ENV] = str(tries + 1)
        os.execve(sys.executable, _respawn_argv(), env)

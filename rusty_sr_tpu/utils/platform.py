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


def ensure_device_or_respawn(max_retries: int = 3, sleep_s: float = 20.0):
    """Fail-fast check that a jax backend is live; re-exec on flake.

    Call at the TOP of a chip-entry script (after arg parsing is fine —
    ``sys.argv`` is preserved verbatim across the exec).  No-op when the
    backend initialises (including CPU-forced test runs).  On the known
    transient plugin-registration failure, sleeps and replaces this
    process with a fresh interpreter (same argv/env + retry counter);
    after ``max_retries`` respawns the original error propagates.
    """
    import jax

    try:
        jax.devices()
        return
    except RuntimeError as e:
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
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

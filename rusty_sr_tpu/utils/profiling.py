"""Tracing/profiling subsystem (SURVEY.md §5: absent in the reference —
stdout prints only; TPU-native we expose the XLA profiler).

`trace(dir)` wraps a region in a jax.profiler trace viewable in
TensorBoard/Perfetto; `device_timer` gives honest steady-state wall timing
of a jitted fn on this backend (in-jit iteration chaining — host dispatch
loops measure only tunnel latency on axon, see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np
import jax
from jax import lax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rusty_sr_trace"):
    """Capture an XLA profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _perturb(x, r: int):
    """Vary a pytree of arrays between timing rounds (+r on every
    numeric leaf; uint8 wraps, floats shift — either is fine, the point
    is a different input value each round)."""
    import jax.numpy as jnp

    def bump(v):
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.number):
            return v + jnp.asarray(r, v.dtype)
        return v
    return jax.tree.map(bump, x)


def device_timer(fn: Callable, x, *, iters: int = 20, rounds: int = 3,
                 fold: Callable = None):
    """Best-of-N seconds per single `fn(x)` pass, measured on device.

    `fn` must map x -> y; `fold` maps y back to x's shape/dtype to carry
    the inter-iteration data dependency (default: identity, requiring
    y compatible with x).  The input is perturbed every round — this
    backend can serve repeated identical dispatches from a result cache
    (CLAUDE.md measurement rules; bench.py does the same).
    """
    fold = fold or (lambda y, x0: y)

    @jax.jit
    def chained(b):
        return lax.fori_loop(0, iters, lambda i, c: fold(fn(c), b), b)

    def sync(y):
        # A VALUE fetch, not block_until_ready: the latter can return
        # early on a never-fetched executable (scripts/perf_probe53 —
        # scan-shaped chains lied by 100x; the 1-element fetch is free).
        # One element of EVERY leaf: a single-leaf fetch would leave
        # sibling leaves in flight.
        for leaf in jax.tree.leaves(y):
            np.asarray(leaf.ravel()[0])

    sync(chained(x))  # compile + warm-up + first fetch
    best = float("inf")
    for r in range(rounds):
        xr = _perturb(x, r + 1)
        sync(xr)  # value fetch, not block_until_ready: the perturb is a
        #           never-fetched executable's output — exactly the case
        #           probe53 showed block_until_ready can return early on,
        #           which would leak the perturb+H2D into the timed region
        t0 = time.perf_counter()
        sync(chained(xr))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

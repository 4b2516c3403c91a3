"""BeLU activation.

Alumina's `BeLU` with `ParamSharing::Spatial` (reference src/network.rs:35,
54-56) is, per the empirical closed form (SURVEY.md §8.3, verified bit-exact
on the published outputs):

    f(x) = p[c] * x + sqrt(x^2 + 1) - 1

with one learned slope ``p`` per channel.  Smooth everywhere, so autodiff
needs no custom VJP.  On TPU this is pure VPU work that XLA fuses into the
producing conv's epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp


def belu(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply BeLU with per-channel slope ``p`` over the last (channel) axis."""
    return p * x + jnp.sqrt(x * x + 1.0) - 1.0

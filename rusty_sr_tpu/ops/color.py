"""sRGB <-> linear transfer functions (IEC 61966-2-1).

Matches alumina's `SrgbToLinear` / `LinearToSrgb` (reference
src/network.rs:90-96,117-119,133-135); the exact piecewise curve reproduces
the reference's `docs/logo_lin.png` to 53.9 dB (SURVEY.md §8.7).
Elementwise VPU work; XLA fuses these into adjacent kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(s: jnp.ndarray) -> jnp.ndarray:
    """s <= 0.04045 ? s/12.92 : ((s + 0.055)/1.055)^2.4 (SURVEY.md §8.7)."""
    # Clamp the power-branch base so the unselected branch never produces
    # NaN gradients for negative inputs under jnp.where.
    base = jnp.maximum((s + 0.055) / 1.055, 1e-12)
    return jnp.where(s <= 0.04045, s / 12.92, base ** 2.4)


def linear_to_srgb(l: jnp.ndarray) -> jnp.ndarray:
    """l <= 0.0031308 ? 12.92*l : 1.055*l^(1/2.4) - 0.055 (SURVEY.md §8.7)."""
    base = jnp.maximum(l, 1e-12)
    return jnp.where(l <= 0.0031308, 12.92 * l, 1.055 * base ** (1.0 / 2.4) - 0.055)

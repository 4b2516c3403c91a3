"""Bilinear ×f upsample (alumina `LinearInterp`) and f×f average pool.

`LinearInterp` semantics (reference src/network.rs:27,118; SURVEY.md §8.5):
separable bilinear with **half-pixel phase** — output index i samples input
coordinate ``(i + 0.5)/f - 0.5`` — and **edge clamping** (out-of-range taps
take the edge sample).  Because the factor is static, the per-axis tap
indices and weights are compile-time constants; the op lowers to two dense
weighted gathers that XLA fuses — no dynamic work, no recompiles.

`Pooling` (reference src/network.rs:91,134) is an f×f mean
(`lax.reduce_window` add / f²), stride f, no padding.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _axis_taps(n: int, f: int):
    """Constant (i0, i1, w) tap tables for 1-D half-pixel clamped bilinear."""
    out = np.arange(n * f, dtype=np.float64)
    src = (out + 0.5) / f - 0.5
    fl = np.floor(src)
    i0 = np.clip(fl, 0, n - 1).astype(np.int32)
    i1 = np.clip(fl + 1, 0, n - 1).astype(np.int32)
    w = (src - fl).astype(np.float32)
    return i0, i1, w


def upsample_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """x: (N,H,W,C) -> (N,f*H,f*W,C), half-pixel phase, edge-clamped."""
    n, h, w, c = x.shape
    i0r, i1r, wr = _axis_taps(h, factor)
    i0c, i1c, wc = _axis_taps(w, factor)
    wr = wr[None, :, None, None]
    wc = wc[None, None, :, None]
    x = jnp.take(x, i0r, axis=1) * (1.0 - wr) + jnp.take(x, i1r, axis=1) * wr
    x = jnp.take(x, i0c, axis=2) * (1.0 - wc) + jnp.take(x, i1c, axis=2) * wc
    return x


def avg_pool(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """x: (N,H,W,C) -> (N,H//f,W//f,C) mean pool, stride f, valid padding."""
    f = factor
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, f, f, 1),
        window_strides=(1, f, f, 1),
        padding="VALID",
    )
    return summed / float(f * f)

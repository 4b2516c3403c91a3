"""Sub-pixel shuffle (alumina `Expand`) as depth-to-space.

Reference semantics (src/network.rs:37-39; verified order SURVEY.md §8.6):

    out[f*y + fy, f*x + fx, c] = in[y, x, (fy*f + fx)*C + c]

i.e. channel blocks are ordered row-offset-major, then col-offset, then
colour.  On TPU this is a pure reshape/transpose that XLA folds into the
surrounding layout assignment — no data-dependent work.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_to_space(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """x: (N,H,W,f*f*C) -> (N,f*H,f*W,C) with the reference's channel order."""
    n, h, w, cff = x.shape
    f = factor
    c = cff // (f * f)
    x = x.reshape(n, h, w, f, f, c)        # (N,H,W,fy,fx,C)
    x = x.transpose(0, 1, 3, 2, 4, 5)      # (N,H,fy,W,fx,C)
    return x.reshape(n, h * f, w * f, c)


def space_to_depth(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Inverse of `depth_to_space` (used in tests and training-side packing)."""
    n, hf, wf, c = x.shape
    f = factor
    h, w = hf // f, wf // f
    x = x.reshape(n, h, f, w, f, c)        # (N,H,fy,W,fx,C)
    x = x.transpose(0, 1, 3, 2, 4, 5)      # (N,H,W,fy,fx,C)
    return x.reshape(n, h, w, f * f * c)

"""Pallas depth-to-space: the HR-sized shuffle is the XLA path's single
most expensive op (~2.6 ms/pass at 8x256^2 — a 6-D transpose emitted
through HBM at ~60 GB/s effective because C=3 forces T(4,128) tiling).

One kernel pass: read an LR row-block (R, W, f*f*C), emit the (f*R, f*W, C)
HR block.  The rearrangement happens on VMEM values; HBM sees one
sequential read + one sequential write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _d2s_kernel(x_ref, o_ref, *, f: int, c: int):
    x = x_ref[...]                       # (R, W, f*f*C)
    r, w, _ = x.shape
    x = x.reshape(r, w, f, f, c)         # (R, W, fy, fx, C)
    x = jnp.transpose(x, (0, 2, 1, 3, 4))  # (R, fy, W, fx, C)
    o_ref[...] = x.reshape(r * f, w * f, c)


@functools.partial(jax.jit, static_argnames=("factor", "rows", "interpret"))
def depth_to_space_pallas(x: jnp.ndarray, factor: int = 3, *, rows: int = 8,
                          interpret: bool = False) -> jnp.ndarray:
    """(N,H,W,f*f*C) -> (N,f*H,f*W,C) with the reference's channel order
    (SURVEY.md §8.6), as a single Pallas pass."""
    n, h, w, cff = x.shape
    f = factor
    c = cff // (f * f)
    interpret = interpret or jax.default_backend() == "cpu"
    rows = min(rows, h)
    while h % rows:
        rows -= 1

    kernel = functools.partial(_d2s_kernel, f=f, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n, h // rows),
        in_specs=[pl.BlockSpec((None, rows, w, cff),
                               lambda ib, ir: (ib, ir, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, rows * f, w * f, c),
                               lambda ib, ir: (ib, ir, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h * f, w * f, c), x.dtype),
        interpret=interpret,
    )(x)

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


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("factor", "rows", "interpret"))
def depth_to_space_pallas(x: jnp.ndarray, factor: int = 3, *, rows: int = 0,
                          interpret: bool = False) -> jnp.ndarray:
    """(N,H,W,f*f*C) -> (N,f*H,f*W,C) with the reference's channel order
    (SURVEY.md §8.6).

    Mosaic cannot reshape/split lane dims in-kernel ('unsupported shape
    cast'), so the permutation is expressed entirely in BlockSpec index
    maps: the grid iterates (batch, row-block, fy, fx); each program
    block-copies the (rows, W, C) lane-slice `channels [(fy*f+fx)*C, +C)`
    to the 5-D output position (row-block, fy, ·, fx, ·).  The final
    (N,H,f,W,f,C)->(N,fH,fW,C) reshape is a free row-major collapse.
    """
    n, h, w, cff = x.shape
    f = factor
    c = cff // (f * f)
    interpret = interpret or jax.default_backend() == "cpu"
    rows = rows or h
    rows = min(rows, h)
    while h % rows:
        rows -= 1

    out5 = pl.pallas_call(
        _copy_kernel,
        grid=(n, h // rows, f, f),
        in_specs=[pl.BlockSpec(
            (None, rows, w, c),
            lambda ib, ir, fy, fx: (ib, ir, 0, fy * f + fx),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (None, rows, None, w, None, c),
            lambda ib, ir, fy, fx: (ib, ir, fy, 0, fx, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, f, w, f, c), x.dtype),
        interpret=interpret,
    )(x)
    return out5.reshape(n, h * f, w * f, c)

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


def _row_slice_kernel(x_ref, o_ref, *, f: int, fc: int):
    # static unroll: dynamic lane offsets can't be proven 128-aligned
    fy = pl.program_id(2)
    for fy_s in range(f):
        @pl.when(fy == fy_s)
        def _(fy_s=fy_s):
            o_ref[...] = x_ref[:, :, fy_s * fc:(fy_s + 1) * fc]


@functools.partial(jax.jit, static_argnames=("factor", "rows", "interpret"))
def depth_to_space_pallas(x: jnp.ndarray, factor: int = 3, *, rows: int = 0,
                          interpret: bool = False) -> jnp.ndarray:
    """(N,H,W,f*f*C) -> (N,f*H,f*W,C) with the reference's channel order
    (SURVEY.md §8.6).

    Mosaic cannot reshape/split lane dims in-kernel ('unsupported shape
    cast') and block shapes must keep the trailing dims full (or
    8/128-divisible), so the permutation is split as: grid (batch,
    row-block, fy); each program lane-slices channels [fy*f*C, (fy+1)*f*C)
    and writes the (rows, W, f*C) block to output row-plane fy.  The
    output array is (N, H, f, W, f*C), whose collapse to (N, fH, fW, C) is
    a free row-major reshape (fx,c adjacency preserved).
    """
    n, h, w, cff = x.shape
    f = factor
    c = cff // (f * f)
    fc = f * c
    interpret = interpret or jax.default_backend() == "cpu"
    rows = rows or h
    rows = min(rows, h)
    while h % rows:
        rows -= 1

    kernel = functools.partial(_row_slice_kernel, f=f, fc=fc)
    out5 = pl.pallas_call(
        kernel,
        grid=(n, h // rows, f),
        in_specs=[pl.BlockSpec(
            (None, rows, w, cff),
            lambda ib, ir, fy: (ib, ir, 0, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (None, rows, None, w, fc),
            lambda ib, ir, fy: (ib, ir, fy, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, f, w, fc), x.dtype),
        interpret=interpret,
    )(x)
    return out5.reshape(n, h * f, w * f, c)

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


def _upsample_axis(x: jnp.ndarray, f: int, axis: int) -> jnp.ndarray:
    """1-D half-pixel clamped bilinear x f along `axis`, gather-free.

    Output index f*y+fy samples y + alpha, alpha = (fy+0.5)/f - 0.5 in
    (-0.5, 0.5], i.e. a 2-tap filter over rows {y+d, y+d+1}, d in {-1,0} —
    static shifts per phase (the shared `_phase_taps` convention, the ONE
    place the phase/clamp rule lives).  Phases are stacked and
    reshape-interleaved; everything is slices/FMAs that XLA fuses — no
    gathers (TPU gathers serialise on the VPU).
    """
    phases = [lo * (1.0 - w) + hi * w if w != 0.0 else lo
              for lo, hi, w in _phase_taps(x, f, axis)]
    y = jnp.stack(phases, axis=axis + 1)      # (..., n, f, ...)
    new_shape = list(x.shape)
    new_shape[axis] = x.shape[axis] * f
    return y.reshape(new_shape)


def upsample_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """x: (N,H,W,C) -> (N,f*H,f*W,C), half-pixel phase, edge-clamped."""
    return _upsample_axis(_upsample_axis(x, factor, 1), factor, 2)


def _phase_taps_padded(xe: jnp.ndarray, f: int, axis: int, n: int):
    """Per-phase 2-tap (lo, hi, w) length-n views of an axis that already
    carries one extra sample on each side (xe.shape[axis] == n + 2)."""
    def slc(start):
        idx = [slice(None)] * xe.ndim
        idx[axis] = slice(start, start + n)
        return xe[tuple(idx)]

    out = []
    for fy in range(f):
        alpha = (fy + 0.5) / f - 0.5
        d = int(np.floor(alpha))
        w = np.float32(alpha - d)
        out.append((slc(1 + d), slc(2 + d), w))
    return out


def _phase_taps(x: jnp.ndarray, f: int, axis: int):
    """Per-phase 2-tap (lo, hi, w) views along `axis` (edge-padded)."""
    n = x.shape[axis]
    xe = jnp.concatenate(
        [lax.slice_in_dim(x, 0, 1, axis=axis), x,
         lax.slice_in_dim(x, n - 1, n, axis=axis)], axis=axis)
    return _phase_taps_padded(xe, f, axis, n)


def bilinear_phases(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """LR-space phase decomposition of `upsample_bilinear`:

        depth_to_space(bilinear_phases(x, f), f) == upsample_bilinear(x, f)

    Returns (N,H,W,f*f*C) with the reference's Expand channel order
    ``(fy*f + fx)*C + c`` (SURVEY.md §8.6), so the SR residual can be added
    in LR space and shuffled once — keeping the whole output path fused
    with the trunk epilogue instead of touching HR-sized tensors twice.
    """
    rows = _phase_taps(x, factor, 1)
    blocks = []
    for lo_r, hi_r, wr in rows:
        xr = lo_r * (1.0 - wr) + hi_r * wr if wr != 0.0 else lo_r
        for lo_c, hi_c, wc in _phase_taps(xr, factor, 2):
            blocks.append(lo_c * (1.0 - wc) + hi_c * wc if wc != 0.0 else lo_c)
    return jnp.concatenate(blocks, axis=-1)


def bilinear_phases_cropped(x: jnp.ndarray, factor: int,
                            y0: int, x0: int, size: int) -> jnp.ndarray:
    """``bilinear_phases(x, f)[:, y0:y0+size, x0:x0+size, :]``, computed
    in a channels-OUTER (N,C,H,W) layout and pre-cropped to the
    ``size+2`` input window the 2-tap filters actually read.

    With C=3 in the minor dim the phase FMAs use 3/128 VPU lanes; moving
    W into lanes and cropping before (not after) the phase math measured
    5.47 -> ~0.9 ms per B=24 pass on v5e (scripts/perf_probe21/22.py).
    Element-wise the operations are identical, so results are
    bit-identical to the uncropped NHWC form.

    Requires an interior crop (``y0, x0 >= 1`` and one sample of margin
    on the far side) — true for the overlap-tile kernel, whose halo is
    the trunk receptive field (>= 1).  The interp taps then never hit
    the tile's edge-clamp, which is what makes the crop commute with the
    phase computation.
    """
    f = factor
    n, hgt, wid, c = x.shape
    if not (y0 >= 1 and x0 >= 1 and y0 + size + 1 <= hgt
            and x0 + size + 1 <= wid):
        return bilinear_phases(x, f)[:, y0:y0 + size, x0:x0 + size, :]
    xt = jnp.transpose(x[:, y0 - 1:y0 + size + 1, x0 - 1:x0 + size + 1, :],
                       (0, 3, 1, 2))                 # (N,C,size+2,size+2)
    blocks = []
    for lo_r, hi_r, wr in _phase_taps_padded(xt, f, 2, size):
        xr = lo_r * (1.0 - wr) + hi_r * wr if wr != 0.0 else lo_r
        for lo_c, hi_c, wc in _phase_taps_padded(xr, f, 3, size):
            blocks.append(lo_c * (1.0 - wc) + hi_c * wc
                          if wc != 0.0 else lo_c)
    ph = jnp.stack(blocks, axis=-1)                  # (N,C,size,size,f*f)
    return jnp.transpose(ph, (0, 2, 3, 4, 1)).reshape(n, size, size,
                                                      f * f * c)


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

"""Same-padded 2-D convolution (cross-correlation) on the MXU.

Alumina's `Convolution` (reference src/network.rs:33,60-72) is stride-1
cross-correlation with zero-padded `Padding::Same` (SURVEY.md §8.3).

Two lowerings, selected by backend at trace time:

- **TPU**: `lax.conv_general_dilated` NHWC/HWIO — XLA lowers it straight
  onto the MXU systolic array with the elementwise epilogue fused.
- **CPU** (tests / virtual meshes): im2col (static shifted slices) + one
  `jnp.dot`.  XLA:CPU's native conv path at HIGHEST precision falls back
  to an unusably slow reference loop; the dot formulation is exact and
  fast.

Precision: with f32 inputs, DEFAULT lets the MXU run single-pass bf16
(~3e-3 relative error — enough to break the ≤1-code parity budget vs the
reference outputs), so the default here is HIGHEST (exact f32, 6-pass on
MXU).  The throughput path opts into bf16 *explicitly* by passing bf16
inputs, rather than silently losing precision on f32 data.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def bf16_split(v):
    """f32 -> (hi, lo) bf16 pair with v ~= hi + lo (hi exact in bf16, lo
    rounds the residual).  hi is ROUND-TO-NEAREST-EVEN to bf16 (done in
    integer bits: +0x7FFF + round-to-even tie bit), so |lo| <= 2^-9|v| —
    half the residual of the earlier truncating mask (measured max
    |lo|/|v|: 0.0039 vs 0.0078) — and rounding lo to bf16 leaves a
    combined representation error of ~2^-17 relative: f32-mantissa class
    it is NOT, but far below the single-rounding ~2^-8 and below f32
    noise once hi*w dominates the dot (the fast-tier budget this split
    serves; quality_eval measures +0.016 dB).

    The split is built in BIT ARITHMETIC, NOT as
    `v - v.astype(bf16).astype(f32)`: XLA's allow-excess-precision
    simplification legally folds `upcast(downcast(v)) -> v` inside jit,
    which silently turns the convert-based residual into `v - v == 0`
    and collapses any two-term-split conv back to single bf16 rounding
    (measured: mean|lo| == 0 in-net, and lax.optimization_barrier does
    not stop it — scripts/perf_probe34.py and PERF.md).  The integer
    form has no convert pair to elide.  `v - hi_f` is exact in f32
    (Sterbenz: hi within a factor 2 of v).  Finite inputs only (the
    +0x7FFF carry would corrupt Inf/NaN payloads — weights and image
    activations are finite by construction).
    """
    import numpy as np
    bits = lax.bitcast_convert_type(v, jnp.uint32)
    rnd = bits + np.uint32(0x7FFF) + ((bits >> 16) & np.uint32(1))
    hi_f = lax.bitcast_convert_type(rnd & np.uint32(0xFFFF0000),
                                    jnp.float32)
    return hi_f.astype(jnp.bfloat16), (v - hi_f).astype(jnp.bfloat16)


import jax


@jax.custom_vjp
def conv_split_precise(h, w):
    """Same-conv with the 3-term masked bf16 split of input AND weights
    (hi*w_hi + hi*w_lo + lo*w_hi as ONE widened dot) — Precision.HIGH-
    class accuracy on pure single-pass MXU bf16 (PERF.md probe29-34).

    Differentiable: the forward runs the split; the custom VJP is the
    gradient of the plain bf16-cast conv (the split is a forward-value
    refinement — its residual terms carry no useful gradient signal, and
    the raw bit-ops in bf16_split have no JVP, which otherwise surfaces
    as a cryptic conv dtype error under jax.grad)."""
    hi, lo = bf16_split(h)
    w_hi, w_lo = bf16_split(w)
    return _conv_native(
        jnp.concatenate([hi, hi, lo], axis=-1),
        jnp.concatenate([w_hi, w_lo, w_hi], axis=2),
        jnp.float32, None)


def _csp_plain(h, w):
    # conv2d_same routes bf16 operands to the im2col dot — unlike the
    # native conv, its transpose accepts the f32 cotangent (this is the
    # same formulation every AMP training conv differentiates through).
    return conv2d_same(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16))


def _csp_fwd(h, w):
    return conv_split_precise(h, w), (h, w)


def _csp_bwd(res, g):
    import jax as _jax
    h, w = res
    _, vjp = _jax.vjp(_csp_plain, h, w)
    return vjp(g)


conv_split_precise.defvjp(_csp_fwd, _csp_bwd)


def _conv_native(x, w, accum, precision):
    return lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMSPEC,
        preferred_element_type=accum,
        precision=precision,
    )


def im2col_patches(xp, kh: int, kw: int):
    """(N, H+kh-1, W+kw-1, Cin) padded tensor -> (N, H, W, kh*kw*Cin)
    patches in (row-offset, col-offset, channel) order — exactly the
    order HWIO `w.reshape(kh*kw*cin, cout)` expects.  The ONE statement
    of the patch-order contract (shared by the f32/bf16 conv and the
    int8 quantised conv, which quantises between pad and slice)."""
    n, hp, wp, cin = xp.shape
    h, wd = hp - (kh - 1), wp - (kw - 1)
    return jnp.concatenate([
        lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, wd, cin))
        for dy in range(kh) for dx in range(kw)
    ], axis=-1)


def _conv_im2col(x, w, accum, precision):
    kh, kw, cin, cout = w.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    pat = im2col_patches(xp, kh, kw)                 # (n,h,w, kh*kw*cin)
    wf = w.reshape(kh * kw * cin, cout)              # HWIO flat matches patch order
    return jnp.dot(pat, wf, precision=precision, preferred_element_type=accum)


def conv2d_same(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    accum_dtype=jnp.float32,
    precision=None,
) -> jnp.ndarray:
    """x: (N,H,W,Cin); w: (kh,kw,Cin,Cout) HWIO. Stride 1, zero-pad Same.

    ``precision=None`` resolves by operand dtype: HIGHEST for f32/f64
    (the exact parity path) and DEFAULT for sub-f32 operands — bf16
    inputs are the explicit throughput opt-in and mean ONE rounding;
    HIGHEST on bf16 operands would force multi-pass emulation over
    already-rounded values (probe48: 11.7 vs 12.6 ms/step at batch 32).
    """
    accum = jnp.promote_types(accum_dtype, x.dtype)
    sub_f32 = jnp.finfo(jnp.promote_types(x.dtype, w.dtype)).bits < 32
    if precision is None:
        precision = (lax.Precision.DEFAULT if sub_f32
                     else lax.Precision.HIGHEST)
    # Note: for bf16 operands the native MXU conv emitter was measured
    # SLOWER than the im2col dot at these shapes (357 vs 436 MPix/s at
    # 16x256^2) — it pays activation layout copies, while the patch dot is
    # HBM-bound at ~570 GB/s.  The im2col branch below therefore serves
    # both the exact-f32 path and the bf16 throughput path.
    if precision == lax.Precision.HIGHEST or sub_f32:
        # Exact-f32 path (and all sub-f32 operands).  Native conv at
        # HIGHEST hits pathologically slow compilation on both XLA:CPU
        # and the axon TPU backend (measured >8 min for a 120x84 image);
        # the dot formulation compiles in seconds and is bit-identical
        # to f64 truth within f32 rounding.
        return _conv_im2col(x, w, accum, precision)
    return _conv_native(x, w, accum, precision)

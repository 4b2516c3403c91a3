"""Fused SR trunk as a single Pallas TPU kernel.

Motivation (measured, scripts/perf_probe2.py on v5e): XLA executes each of
the net's convs as a separate HBM-roundtrip op with a ~2-3 ms fixed cost at
these shapes — conv10 (32->27, 3x3) costs *more* than the 10x-heavier
merged convA.  The win is keeping every intermediate activation in VMEM
and feeding the MXU back-to-back matmuls: one kernel computes the whole
trunk (conv0 -> A -> B -> C -> D, SURVEY.md §2.3) per row-block.

Kernel layout:

- Grid: (batch, row-blocks).  Each program computes RH output rows of the
  `expand` tensor (C = 3*f^2) for one padded tile from an input slab of
  RH + 2*HALO rows.  Slabs overlap vertically, and Pallas block tilings
  cannot overlap, so the caller pre-gathers x into (B, nblk, slab, W, C)
  — a ~2x duplication of a tensor that is <2% of the activation traffic.
- Every conv stage is an im2col patch build (static shifted VMEM slices,
  kernel-offset-major, matching HWIO-flat weights) followed by ONE MXU
  matmul: conv0 (K=75,N=32), A (K=800,N=96), B (K=288,N=64+e),
  C (K=288,N=32+e), D (K=288,N=e).  Stage row extents shrink by the conv
  radius per layer (f: +5, l1: +3, l2: +2, l3: +1 rows around the output
  block), so nothing is recomputed across stages within a block.
- Columns are computed at full padded-tile width with Same zero-pad at the
  slab edge; the caller crops the HALO columns, which also removes the
  tile-edge pollution (same contract as parallel/tiling.py).
- The border mask (1 inside the true image) multiplies every activation so
  image-border zero-pad semantics match the reference (every alumina conv
  zero-pads at the true border, src/network.rs Padding::Same).  Pass
  mask=None for fully-interior batches (e.g. benchmarks) to skip the
  multiplies.

Exact-parity mode: compute_dtype=jnp.float32 uses HIGHEST-precision dots
(6-pass bf16 on the MXU = exact f32).  Throughput mode uses bf16 operands
with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 7  # trunk receptive-field radius in LR px (SURVEY.md §7)


def pack_trunk_weights(params, factor: int = 3, dtype=jnp.bfloat16):
    """Flatten HWIO conv weights to (kh*kw*Cin, Cout) matmul operands.

    HWIO `reshape(-1, O)` is exactly the patch order the kernel builds
    (row-offset, col-offset, channel) and merges same-source convs
    (conv1/2/3 -> A etc.; cf. models.sr_net.merge_params).  Bias/BeLU
    vectors are packed 2-D (1, N) for SMEM/VMEM friendliness.
    """
    def flat(w):
        w = jnp.asarray(w)
        return w.reshape(-1, w.shape[-1]).astype(dtype)

    def cat(*names):
        return jnp.concatenate([jnp.asarray(params[n]) for n in names], axis=3)

    def vec(name):
        v = jnp.asarray(params[name], jnp.float32)
        return v.reshape(1, -1)

    return {
        "w0": flat(params["conv0"]),                   # (75, 32)
        "wA": flat(cat("conv1", "conv2", "conv3")),    # (800, 96)
        "wB": flat(cat("conv5", "conv6", "conv7")),    # (288, 64+e)
        "wC": flat(cat("conv8", "conv9")),             # (288, 32+e)
        "wD": flat(params["conv10"]),                  # (288, e)
        "f_bias": vec("f_bias"), "f_belu": vec("f_belu"),
        "l1_bias": vec("l1_bias"), "l1_belu": vec("l1_belu"),
        "l2_bias": vec("l2_bias"), "l2_belu": vec("l2_belu"),
        "l3_bias": vec("l3_bias"), "l3_belu": vec("l3_belu"),
        "expand_bias": vec("expand_bias"),
    }


def _conv_stage(src, rows_out, width, kh, w_flat, precision, pat_ref):
    """im2col patch build into VMEM scratch + one MXU matmul.

    src: (rows_out+kh-1, width, Cin) with vertical halo included; columns
    are Same-zero-padded here.  The shifted slices are *stored* into
    ``pat_ref`` (stores relayout arbitrary vector offsets; Mosaic's concat
    cannot — 'offset mismatch on non-concat dimension'), then read back
    offset-0 for a single (M, K) x (K, N) dot.
    """
    r = kh // 2
    cin = src.shape[-1]
    srcp = jnp.pad(src, ((0, 0), (r, r), (0, 0)))
    k_tot = kh * kh * cin
    for dy in range(kh):
        for dx in range(kh):
            k = dy * kh + dx
            pat_ref[0:rows_out, 0:width, k * cin:(k + 1) * cin] = \
                srcp[dy:dy + rows_out, dx:dx + width, :]
    pat = pat_ref[0:rows_out, 0:width, 0:k_tot]
    pat = pat.reshape(rows_out * width, k_tot)
    out = jnp.dot(pat, w_flat, preferred_element_type=jnp.float32,
                  precision=precision)
    return out.reshape(rows_out, width, w_flat.shape[-1])


def _belu(x, p):
    return p * x + jnp.sqrt(x * x + 1.0) - 1.0


def _trunk_kernel(x_ref, m_ref,
                  w0_ref, wA_ref, wB_ref, wC_ref, wD_ref,
                  fb_ref, fp_ref, b1_ref, p1_ref, b2_ref, p2_ref,
                  b3_ref, p3_ref, eb_ref,
                  out_ref, pat_ref, *, rh: int, width: int, e: int,
                  compute_dtype, use_mask: bool):
    cd = compute_dtype
    precision = (lax.Precision.HIGHEST if cd == jnp.float32 else None)

    def masked(act, start, nrows):
        if not use_mask:
            return act.astype(cd)
        m = m_ref[pl.ds(start, nrows), :, :].astype(act.dtype)
        return (act * m).astype(cd)

    # slab row 0 == output row -HALO; stage base rows: f:-5, l1:-3, l2:-2,
    # l3:-1, expand:0  => slab offsets 2, 4, 5, 6, 7.
    x = x_ref[...].astype(cd)                             # (rh+14, W, 3)

    f_rows = rh + 10
    f = _conv_stage(x, f_rows, width, 5, w0_ref[...].astype(cd), precision,
                    pat_ref)
    f = masked(_belu(f + fb_ref[0], fp_ref[0]), 2, f_rows)

    a_rows = rh + 6
    a = _conv_stage(f, a_rows, width, 5, wA_ref[...].astype(cd), precision,
                    pat_ref)
    l1 = masked(_belu(a[..., :32] + b1_ref[0], p1_ref[0]), 4, a_rows)

    b_rows = rh + 4
    b = _conv_stage(l1, b_rows, width, 3, wB_ref[...].astype(cd), precision,
                    pat_ref)
    l2 = masked(_belu(a[1:1 + b_rows, :, 32:64] + b[..., :32] + b2_ref[0],
                      p2_ref[0]), 5, b_rows)

    c_rows = rh + 2
    c = _conv_stage(l2, c_rows, width, 3, wC_ref[...].astype(cd), precision,
                    pat_ref)
    l3 = masked(_belu(a[2:2 + c_rows, :, 64:96] + b[1:1 + c_rows, :, 32:64]
                      + c[..., :32] + b3_ref[0], p3_ref[0]), 6, c_rows)

    d = _conv_stage(l3, rh, width, 3, wD_ref[...].astype(cd), precision,
                    pat_ref)
    expand = (b[2:2 + rh, :, 64:64 + e].astype(jnp.float32)
              + c[1:1 + rh, :, 32:32 + e].astype(jnp.float32)
              + d[..., :e].astype(jnp.float32) + eb_ref[0])
    out_ref[...] = expand.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("factor", "rh", "compute_dtype",
                                    "interpret"))
def fused_trunk(packed, x, mask=None, factor: int = 3, *, rh: int = 16,
                compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Compute the `expand` tensor for zero-padded tiles, fused in VMEM.

    x: (B, S+2h, S+2h, 3) zero-padded tiles (h = HALO); mask likewise
    (B, S+2h, S+2h, 1) or None for interior tiles.  Returns
    (B, S, S, 3*factor^2): the pre-shuffle residual, halo cropped.
    """
    bsz, side, _, _ = x.shape
    h = HALO
    s = side - 2 * h
    e = 3 * factor * factor
    interpret = interpret or jax.default_backend() == "cpu"
    assert s % rh == 0, f"output rows {s} must divide row-block {rh}"
    nblk = s // rh
    slab = rh + 2 * h
    use_mask = mask is not None

    # Overlapping vertical slabs, pre-gathered (Pallas blocks cannot
    # overlap).  Input is tiny relative to activations; ~2x duplication.
    def slabify(t):
        return jnp.stack([t[:, i * rh:i * rh + slab] for i in range(nblk)],
                         axis=1)

    xs = slabify(x)
    ms = slabify(mask) if use_mask else jnp.zeros(
        (bsz, nblk, 1, 1, 1), x.dtype)

    def slab_map(ib, ir):
        return (ib, ir, 0, 0, 0)

    m_block = ((None, None, slab, side, 1) if use_mask
               else (None, None, 1, 1, 1))
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)]
    vec_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(9)]

    kernel = functools.partial(_trunk_kernel, rh=rh, width=side, e=e,
                               compute_dtype=compute_dtype, use_mask=use_mask)

    grid_x = pl.BlockSpec((None, None, slab, side, 3),
                          slab_map, memory_space=pltpu.VMEM)
    grid_m = pl.BlockSpec(m_block, slab_map, memory_space=pltpu.VMEM)

    # One shared im2col scratch, sized for the largest stage (A: rows rh+6,
    # K=800; conv0 needs rh+10 rows at K=75 -> rows rh+10 x K 800 covers all).
    pat_scratch = pltpu.VMEM((rh + 10, side, 800), compute_dtype)

    out = pl.pallas_call(
        kernel,
        grid=(bsz, nblk),
        in_specs=[grid_x, grid_m, *w_specs, *vec_specs],
        out_specs=pl.BlockSpec((None, rh, side, e),
                               lambda ib, ir: (ib, ir, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, side, e), jnp.float32),
        scratch_shapes=[pat_scratch],
        interpret=interpret,
    )(
        xs,
        ms,
        packed["w0"], packed["wA"], packed["wB"], packed["wC"], packed["wD"],
        packed["f_bias"], packed["f_belu"],
        packed["l1_bias"], packed["l1_belu"],
        packed["l2_bias"], packed["l2_belu"],
        packed["l3_bias"], packed["l3_belu"],
        packed["expand_bias"],
    )
    return out[:, :, h:h + s, :]

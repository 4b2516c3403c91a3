"""Fused SR trunk as a single Pallas TPU kernel.

Motivation (measured, scripts/perf_probe2.py on v5e): XLA executes each of
the net's convs as a separate HBM-roundtrip op with a ~2-3 ms fixed cost at
these shapes — conv10 (32->27, 3x3) costs *more* than the 10x-heavier
merged convA.  The win is keeping every intermediate activation in VMEM
and feeding the MXU back-to-back matmuls: one kernel computes the whole
trunk (conv0 -> A -> B -> C -> D, SURVEY.md §2.3) per (row, column) block.

Kernel design:

- Grid: (batch, row-blocks, col-blocks).  Each program computes an
  (RH, CW) block of the `expand` tensor (C = 3*f^2) from an input slab of
  (RH+2*HALO, CW+2*HALO).  Slabs overlap spatially and Pallas block
  tilings cannot overlap, so the caller pre-gathers x into
  (B, nrb, ncb, slab_r, slab_c, 3) — a ~3x duplication of a tensor that
  is <2% of the activation traffic.
- Stage extents shrink by the conv radius per layer in BOTH dims
  (f: +5, l1: +3, l2: +2, l3: +1 around the output block), so nothing is
  recomputed across stages within a block and no in-kernel padding is
  needed — the outermost HALO ring of the caller's zero-padded tiles
  supplies the true-border zeros.
- Every conv stage is an im2col patch build into a shared VMEM scratch
  (explicit stores, which relayout arbitrary vector offsets — Mosaic's
  concat cannot: 'offset mismatch on non-concat dimension'), followed by
  one MXU matmul per K-chunk (kernel offsets grouped so K <= 512, which
  bounds the scratch and the reshape copy; VMEM budget measured 24.8 MB
  un-chunked at full width vs the 16 MB scoped limit).
- The border mask (1 inside the true image) multiplies every activation so
  image-border zero-pad semantics match the reference (every alumina conv
  zero-pads at the true border, src/network.rs Padding::Same); see
  parallel/tiling.py.  Pass mask=None for interior batches to skip it.

Exact-parity mode: compute_dtype=jnp.float32 uses HIGHEST-precision dots
(6-pass bf16 on the MXU = exact f32).  Throughput mode uses bf16 operands
with f32 accumulation in the matmuls and bf16 activations between stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The one closed-form BeLU (ops/activations.py) — pure jnp, usable inside
# a Pallas kernel; importing keeps the golden-tested math in one place.
from rusty_sr_tpu.ops.activations import belu as _belu

HALO = 7   # trunk receptive-field radius in LR px (SURVEY.md §7)
_KMAX = 512  # max matmul K per chunk (bounds patch scratch)


def pack_trunk_weights(params, factor: int = 3, dtype=jnp.bfloat16):
    """Flatten HWIO conv weights to (kh*kw*Cin, Cout) matmul operands.

    HWIO `reshape(-1, O)` is exactly the patch order the kernel builds
    (row-offset, col-offset, channel) and merges same-source convs
    (conv1/2/3 -> A etc.; cf. models.sr_net.merge_params).  Bias/BeLU
    vectors are packed 2-D (1, N).
    """
    cin = int(jnp.asarray(params["conv0"]).shape[2])  # channels-generic
    e = cin * factor * factor
    got = int(jnp.asarray(params["conv10"]).shape[-1])
    if got != e:
        raise ValueError(
            f"params expand to {got} channels but factor {factor} with "
            f"{cin} input channels needs {e} (C*factor^2) — wrong "
            "weights for this factor")

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


def _conv_stage(src, rows_out, cols_out, kh, w_flat, precision, pat_ref,
                rank3):
    """im2col into VMEM scratch + K-chunked MXU matmuls.

    src: (rows_out+kh-1, cols_out+kh-1, Cin), halo included in both dims.
    Kernel offsets are grouped so each chunk's K = group*Cin <= _KMAX;
    each group fills the scratch once and issues one matmul, accumulating
    in f32.  rank3=True contracts K on the rank-3 patches directly
    (avoids the (rows,cols,K)->(rows*cols,K) relayout copy).
    """
    cin = src.shape[-1]
    offsets = [(dy, dx) for dy in range(kh) for dx in range(kh)]
    per_chunk = max(1, _KMAX // cin)
    out = None
    for c0 in range(0, len(offsets), per_chunk):
        group = offsets[c0:c0 + per_chunk]
        k_chunk = len(group) * cin
        for g, (dy, dx) in enumerate(group):
            pat_ref[0:rows_out, 0:cols_out, g * cin:(g + 1) * cin] = \
                src[dy:dy + rows_out, dx:dx + cols_out, :]
        pat = pat_ref[0:rows_out, 0:cols_out, 0:k_chunk]
        w_c = w_flat[c0 * cin:c0 * cin + k_chunk, :]
        if rank3:
            part = lax.dot_general(
                pat, w_c, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        else:
            part = jnp.dot(pat.reshape(rows_out * cols_out, k_chunk), w_c,
                           preferred_element_type=jnp.float32,
                           precision=precision
                           ).reshape(rows_out, cols_out, w_flat.shape[-1])
        out = part if out is None else out + part
    return out


def _trunk_kernel(x_ref, m_ref,
                  w0_ref, wA_ref, wB_ref, wC_ref, wD_ref,
                  fb_ref, fp_ref, b1_ref, p1_ref, b2_ref, p2_ref,
                  b3_ref, p3_ref, eb_ref,
                  out_ref, pat_ref, *, rh: int, cw: int, e: int,
                  compute_dtype, use_mask: bool, rank3: bool):
    cd = compute_dtype
    precision = (lax.Precision.HIGHEST if cd == jnp.float32 else None)

    def masked(act, off, nr, nc):
        act = act.astype(cd)
        if not use_mask:
            return act
        m = m_ref[pl.ds(off, nr), pl.ds(off, nc), :].astype(cd)
        return act * m

    # slab origin == output origin - HALO; stage bases (both dims):
    # f: -5 (slab off 2), l1: -3 (4), l2: -2 (5), l3: -1 (6), expand: 0 (7)
    n = fb_ref.shape[-1]   # trunk width (32 default, width-generic)
    x = x_ref[...].astype(cd)                       # (rh+14, cw+14, 3)

    f = _conv_stage(x, rh + 10, cw + 10, 5, w0_ref[...].astype(cd),
                    precision, pat_ref, rank3)
    f = masked(_belu(f + fb_ref[0], fp_ref[0]), 2, rh + 10, cw + 10)

    a = _conv_stage(f, rh + 6, cw + 6, 5, wA_ref[...].astype(cd),
                    precision, pat_ref, rank3)
    l1 = masked(_belu(a[..., :n] + b1_ref[0], p1_ref[0]), 4,
                rh + 6, cw + 6)
    a = a.astype(cd)

    b = _conv_stage(l1, rh + 4, cw + 4, 3, wB_ref[...].astype(cd),
                    precision, pat_ref, rank3)
    l2 = masked(_belu(a[1:rh + 5, 1:cw + 5, n:2 * n] + b[..., :n]
                      + b2_ref[0], p2_ref[0]), 5, rh + 4, cw + 4)
    b = b.astype(cd)

    c = _conv_stage(l2, rh + 2, cw + 2, 3, wC_ref[...].astype(cd),
                    precision, pat_ref, rank3)
    l3 = masked(_belu(a[2:rh + 4, 2:cw + 4, 2 * n:3 * n]
                      + b[1:rh + 3, 1:cw + 3, n:2 * n]
                      + c[..., :n] + b3_ref[0], p3_ref[0]), 6,
                rh + 2, cw + 2)
    c = c.astype(cd)

    d = _conv_stage(l3, rh, cw, 3, wD_ref[...].astype(cd), precision,
                    pat_ref, rank3)
    expand = (b[2:rh + 2, 2:cw + 2, 2 * n:2 * n + e].astype(jnp.float32)
              + c[1:rh + 1, 1:cw + 1, n:n + e].astype(jnp.float32)
              + d[..., :e] + eb_ref[0])
    out_ref[...] = expand.astype(out_ref.dtype)


def _pick_cw(s: int) -> int:
    """Largest divisor of s that is <= 160 (VMEM-friendly block width)."""
    if s <= 160:
        return s
    for cand in range(min(160, s), 0, -1):
        if s % cand == 0:
            return cand
    return s


@functools.partial(jax.jit,
                   static_argnames=("factor", "rh", "cw", "compute_dtype",
                                    "interpret", "vmem_mb", "rank3"))
def fused_trunk(packed, x, mask=None, factor: int = 3, *, rh: int = 8,
                cw: int = 0, compute_dtype=jnp.bfloat16,
                interpret: bool = False, vmem_mb: int = 0,
                rank3: bool = True):
    """Compute the `expand` tensor for zero-padded tiles, fused in VMEM.

    x: (B, S+2h, S+2h, 3) zero-padded tiles (h = HALO); mask likewise
    (B, S+2h, S+2h, 1) or None for interior tiles.  Returns
    (B, S, S, 3*factor^2): the pre-shuffle residual, halo cropped.
    ``rh``/``cw`` are the per-program output block dims (cw=0 picks a
    divisor of S near 128 automatically).
    """
    bsz, side, _, cin = x.shape
    h = HALO
    s = side - 2 * h
    e = cin * factor * factor   # channels-generic (default 3)
    interpret = interpret or jax.default_backend() == "cpu"
    cw = cw or _pick_cw(s)
    assert s % rh == 0 and s % cw == 0, (s, rh, cw)
    nrb, ncb = s // rh, s // cw
    slab_r, slab_c = rh + 2 * h, cw + 2 * h
    use_mask = mask is not None

    def slabify(t):
        rows = jnp.stack([t[:, i * rh:i * rh + slab_r] for i in range(nrb)], 1)
        return jnp.stack(
            [rows[:, :, :, j * cw:j * cw + slab_c, :] for j in range(ncb)], 2)

    xs = slabify(x)
    ms = slabify(mask) if use_mask else jnp.zeros(
        (bsz, nrb, ncb, 1, 1, 1), x.dtype)

    def slab_map(ib, ir, ic):
        return (ib, ir, ic, 0, 0, 0)

    m_block = ((None, None, None, slab_r, slab_c, 1) if use_mask
               else (None, None, None, 1, 1, 1))
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)]
    vec_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(9)]

    kernel = functools.partial(_trunk_kernel, rh=rh, cw=cw, e=e,
                               compute_dtype=compute_dtype, use_mask=use_mask,
                               rank3=rank3)

    out = pl.pallas_call(
        kernel,
        grid=(bsz, nrb, ncb),
        in_specs=[
            pl.BlockSpec((None, None, None, slab_r, slab_c, cin),
                         slab_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(m_block, slab_map, memory_space=pltpu.VMEM),
            *w_specs, *vec_specs,
        ],
        out_specs=pl.BlockSpec((None, rh, cw, e),
                               lambda ib, ir, ic: (ib, ir, ic, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, s, e), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rh + 10, cw + 10, _KMAX), compute_dtype)],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 2**20) if vmem_mb else None),
        interpret=interpret,
    )(
        xs, ms,
        packed["w0"], packed["wA"], packed["wB"], packed["wC"], packed["wD"],
        packed["f_bias"], packed["f_belu"],
        packed["l1_bias"], packed["l1_belu"],
        packed["l2_bias"], packed["l2_belu"],
        packed["l3_bias"], packed["l3_belu"],
        packed["expand_bias"],
    )
    return out

"""Overlap-tile inference: arbitrary image sizes at zero recompiles.

The reference runs `graph.forward` on the whole image at its native size
(src/main.rs:168-171) — fine for a CPU interpreter, fatal for XLA where
every new shape is a new compile.  TPU-native we decompose the LR image
into fixed-size tiles with a halo and batch them through one jitted
function, so any image size reuses the same executable and the conv
pipeline stays at full MXU utilisation.

Exactness argument (SURVEY.md §7 "edge semantics"):

- The residual trunk (conv0..conv10) has receptive-field radius
  2+2+1+1+1 = 7 LR px (5x5,5x5,3x3,3x3,3x3 chain).  In the full image,
  *every* conv zero-pads at the true image border (`Padding::Same`), so a
  tile must reproduce zeros beyond the true border at every layer, not
  just at the input.  Each tile therefore carries a border mask (1 inside
  the true image, 0 beyond it); activations are masked after each BeLU,
  which makes every conv's out-of-image taps read exactly the zeros the
  full-image computation would have seen.  Interior tiles have an all-ones
  mask and real neighbour data in their halo; pollution from the tile's
  own Same-pad reaches only HALO px inward — entirely inside the cropped
  halo.
- The bilinear base path (`LinearInterp`) clamps taps to the true image
  edge (§8.5).  Clamping == edge replication, so the base reads tiles from
  an *edge-replicated* padded copy.  Bilinear with half-pixel phase is
  translation-equivariant under integer tile offsets, so per-tile
  computation with the halo cropped off matches full-image bit-for-bit.

The host-side tile gather/scatter hot path runs in native C++
(native/tileio.cc via utils.native, numpy fallback included); the device
side offers two engines: "xla" (merged-conv jit graph — the fast default)
and "fused" (the single Pallas trunk kernel from ops.pallas.trunk; correct
on hardware but currently patch-store-bound, kept for further kernel work).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu.utils import native

# Receptive-field radius of the trunk in LR pixels (confirmed by impulse
# test; SURVEY.md §7 item 5 and tests/test_tiling.py).
HALO = 7

def _conv0_s2d_weights(w0):
    """(5,5,3,32) conv0 -> (3,3,12,128) on the 2x2 space-to-depth grid.

    Cin=3 strands 125/128 MXU lanes and makes conv0 the single biggest
    line item of the pass (6.08 of 27.4 ms, scripts/perf_probe20.py).
    Packing 2x2 LR blocks into 12 channels turns it into a half-
    resolution 3x3x12->128 conv (K=108, N=128).  Single-block instance
    of `_s2d_conv_weights` (the perm is the identity for one block).
    Pure re-indexing — same products, bit-class-identical accumulation.
    """
    return _s2d_conv_weights(w0, [w0.shape[3]])


def _s2d_maps_k(k):
    """s2d2 index maps for an odd k x k Same conv: 3x3 packed taps
    (center 1), u = 2*ap + by - fy + (c - 2) with c = (k-1)//2.  The k=5
    instance reproduces `_s2d_index_maps` exactly; k=3 needs the same 3
    packed taps (a 2-tap window cannot reach original row y-1 for the
    by==fy phases — verified against the direct conv to f32 noise)."""
    c = (k - 1) // 2
    uu = np.zeros((3, 3, 4, 4), np.int32)
    vv = np.zeros_like(uu)
    ok = np.zeros(uu.shape, np.float32)
    for ap in range(3):
        for bp in range(3):
            for by in range(2):
                for bx in range(2):
                    for fy in range(2):
                        for fx in range(2):
                            g, ff = by * 2 + bx, fy * 2 + fx
                            u = 2 * ap + by - fy + (c - 2)
                            v = 2 * bp + bx - fx + (c - 2)
                            uu[ap, bp, g, ff] = min(max(u, 0), k - 1)
                            vv[ap, bp, g, ff] = min(max(v, 0), k - 1)
                            ok[ap, bp, g, ff] = float(
                                0 <= u < k and 0 <= v < k)
    return uu, vv, ok


def _s2d_conv_weights(w, blocks):
    """(k,k,ci,co) -> (3,3,4ci,4co) space-to-depth packed weights with
    BLOCK-major output channels: for sub-block b (widths `blocks`,
    sum == co) the packed channel is 4*offset_b + ff*width_b + c_b, so
    every merged-stage slice is a contiguous channel range in packed
    space and per-channel params tile as jnp.tile(p, 4).  Trace-safe
    (the index/perm maps are static numpy; `w` may be a jax tracer)."""
    k, _, ci, co = w.shape
    assert sum(blocks) == co
    uu, vv, ok = _s2d_maps_k(k)
    wg = w[uu, vv] * ok[..., None, None]          # (3,3,4g,4f,ci,co)
    wflat = wg.transpose(0, 1, 2, 4, 3, 5).reshape(3, 3, 4 * ci, 4 * co)
    perm = np.empty(4 * co, np.int64)
    off = 0
    for wb in blocks:
        for ff in range(4):
            for cb in range(wb):
                perm[4 * off + ff * wb + cb] = ff * co + off + cb
        off += wb
    return wflat[..., perm]


def _base_conv_weights(f, C=3):
    """(3,3,C,f*f*C): `LinearInterp` xf as a Same conv at LR.  The
    half-pixel phase taps span < 1 px for every factor, so a 3x3 kernel
    always suffices; output channel (fy*f+fx)*C + c matches the
    expand/d2s order (SURVEY.md 8.5-8.6); edge-replicated input tiles
    reproduce the clamp at true image borders."""
    wr = np.zeros((f, 3), np.float64)
    for i in range(f):
        c0 = (i + 0.5) / f - 0.5
        lo = int(np.floor(c0))
        frac = c0 - lo
        wr[i, lo + 1] += 1.0 - frac
        wr[i, lo + 2] += frac
    W = np.zeros((3, 3, C, f * f * C), np.float32)
    for fy in range(f):
        for fx in range(f):
            for dy in range(3):
                for dx in range(3):
                    for c in range(C):
                        W[dy, dx, c, (fy * f + fx) * C + c] = \
                            wr[fy, dy] * wr[fx, dx]
    return W


def packed_trunk_params(params, compute_dtype=jnp.bfloat16, factor=3):
    """Pre-packed weight tree for `_tile_kernel_packed` (PERF.md: the
    emitter's rate scales super-linearly with K/N at this net's shapes,
    so the whole trunk runs in 2x2 space-to-depth space — quarter
    resolution, 4x channels: 797 vs 609 MPix/s at B=24,
    perf_probe35/36).  conv0 keeps the u8-exact /256 trick + masked
    weight split; the bilinear BASE rides as extra (weight-split) K rows
    of the conv10 dot reading the packed edge tiles, so the whole
    HR-sized f32 base/sum tail collapses into the f32 accumulator +
    packed-space quantisation (46.8 -> 37.7 ms/pass at B=112,
    perf_probe39/40)."""
    from rusty_sr_tpu.ops.conv import bf16_split
    p = trunk_params(params)
    n = p["f_bias"].shape[0]
    e = p["expand_bias"].shape[0]
    w0f = _conv0_s2d_weights(p["conv0"] * (256.0 / 255.0))
    w0_hi, w0_lo = bf16_split(jnp.asarray(w0f))
    wd = jnp.asarray(_s2d_conv_weights(p["conv10"], [e])
                     ).astype(compute_dtype)
    wb = _s2d_conv_weights(
        _base_conv_weights(factor) * (256.0 / 255.0), [e])
    wb_hi, wb_lo = bf16_split(jnp.asarray(wb))
    out = {
        "W0": jnp.concatenate([w0_hi, w0_lo], axis=2),
        "WA": jnp.asarray(_s2d_conv_weights(p["convA"], [n, n, n])
                          ).astype(compute_dtype),
        "WB": jnp.asarray(_s2d_conv_weights(p["convB"], [n, n, e])
                          ).astype(compute_dtype),
        "WC": jnp.asarray(_s2d_conv_weights(p["convC"], [n, e])
                          ).astype(compute_dtype),
        "WD": jnp.concatenate([wd, wb_hi, wb_lo], axis=2),
    }
    for k in ("f_bias", "f_belu", "l1_bias", "l1_belu", "l2_bias",
              "l2_belu", "l3_bias", "l3_belu", "expand_bias"):
        out[k] = jnp.tile(p[k], 4)
    return out


@functools.partial(jax.jit, static_argnames=("factor", "tile",
                                             "compute_dtype"))
def _tile_kernel_packed(pp, zero_tiles, edge_tiles, mask_tiles, factor: int,
                        tile: int, compute_dtype=jnp.bfloat16):
    """(B, T+2h, T+2h, ·) u8 -> (B, f*T, f*T, 3) u8 — fast tier with the
    WHOLE trunk in 2x2 space-to-depth space (quarter resolution, 4x
    channels; block-major channel grouping keeps stage slices
    contiguous).  The bilinear base arrives as extra K rows of the
    conv10 dot (see packed_trunk_params), the expand+base sum lives in
    the dot's f32 accumulator, and quantisation happens in packed space
    — the only full-resolution ops left are u8 unpack/crop/d2s.
    Numerically the same products as `_tile_kernel`'s fast path
    (bf16-class identical; gated by the same GT-budget harness).
    Requires u8 tiles with an even padded side.

    ``zero_tiles=None`` derives the zero-padded tiles in packed space:
    zero-pad == edge-pad * mask bytewise (the two gathers differ only
    outside the image, where the mask is 0, and u8 codes times a {0,1}
    mask are exact in bf16) — skips the third input buffer's pack, its
    host gather, and its H2D upload (probe55)."""
    from rusty_sr_tpu.ops.activations import belu
    from rusty_sr_tpu.ops.conv import _conv_native
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space

    h = HALO
    cd = compute_dtype
    nb, sh, sw, ci = edge_tiles.shape
    ph, pw = sh // 2, sw // 2
    n = pp["f_bias"].shape[0] // 4
    e = pp["expand_bias"].shape[0] // 4

    def pack(t):
        c = t.shape[-1]
        return t.reshape(nb, ph, 2, pw, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(nb, ph, pw, 4 * c)

    te8 = pack(edge_tiles).astype(cd) * jnp.asarray(2.0 ** -8, cd)
    m4 = pack(mask_tiles).astype(cd)
    if zero_tiles is None:
        t8 = te8 * jnp.repeat(m4, ci, axis=-1)
    else:
        t8 = pack(zero_tiles).astype(cd) * jnp.asarray(2.0 ** -8, cd)
    o = _conv_native(jnp.concatenate([t8, t8], -1), pp["W0"],
                     jnp.float32, None)
    mN = jnp.repeat(m4, n, axis=-1)
    f_ = belu(o + pp["f_bias"], pp["f_belu"]).astype(cd) * mN

    def cv(t, W):
        return _conv_native(t, W, jnp.float32, None).astype(cd)

    def up(t):
        return t.astype(jnp.float32)

    N = 4 * n
    a = cv(f_, pp["WA"])
    l1 = belu(up(a[..., :N]) + pp["l1_bias"], pp["l1_belu"]) \
        .astype(cd) * mN
    b = cv(l1, pp["WB"])
    l2 = belu(up(a[..., N:2 * N]) + up(b[..., :N]) + pp["l2_bias"],
              pp["l2_belu"]).astype(cd) * mN
    c = cv(l2, pp["WC"])
    l3 = belu(up(a[..., 2 * N:3 * N]) + up(b[..., N:2 * N])
              + up(c[..., :N]) + pp["l3_bias"], pp["l3_belu"]) \
        .astype(cd) * mN
    d = _conv_native(jnp.concatenate([l3, te8, te8], -1), pp["WD"],
                     jnp.float32, None)      # conv10 + BASE, f32 accum
    total = (up(b[..., 2 * N:2 * N + 4 * e]) + up(c[..., N:N + 4 * e])
             + d + pp["expand_bias"])
    tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5) \
        .astype(jnp.uint8)
    ex = tq.reshape(nb, ph, pw, 2, 2, e) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(nb, sh, sw, e)
    return depth_to_space(ex[:, h:h + tile, h:h + tile, :], factor)


def trunk_params(params):
    """Exactly the (merged-conv) keys `_tile_kernel` consumes.

    Merging same-source convs along O (see models.sr_net.merge_params) is
    mathematically identical and turns the dominant stage into wide MXU
    matmuls; restricting to the consumed keys keeps the jit pytree stable
    whether the caller passes raw or pre-merged trees.
    """
    if "convA" not in params:
        from rusty_sr_tpu.models.sr_net import merge_params
        params = merge_params(params)
    keys = ("conv0", "convA", "convB", "convC", "conv10",
            "f_bias", "f_belu", "l1_bias", "l1_belu", "l2_bias", "l2_belu",
            "l3_bias", "l3_belu", "expand_bias")
    return {k: params[k] for k in keys}


@functools.partial(jax.jit, static_argnames=("factor", "tile", "compute_dtype",
                                             "u8_io", "out16", "conv0_s2d",
                                             "conv0_ws"))
def _tile_kernel(params, zero_tiles, edge_tiles, mask_tiles, factor: int,
                 tile: int, compute_dtype=None, u8_io: bool = False,
                 out16: bool = False, conv0_s2d: bool = True,
                 conv0_ws: bool = True):
    """(B, T+2h, T+2h, ·) -> (B, f*T, f*T, 3) exact SR of tile centres.

    ``params`` is the merged-conv tree from `trunk_params` — the same
    convA/B/C decomposition `sr_apply_fused` uses, so the CLI's tiled path
    and the benched path run the identical device graph.

    With ``u8_io`` the tiles arrive as uint8 (converted to f32/255 on
    device — exact for image sources) and the result is quantised to uint8
    on device with the reference's clamp->x255->round-half-up rule
    (src/main.rs:175) — 4x less transfer each way, which dominates
    end-to-end time on this tunneled host.

    ``out16`` (fast tier only) casts the trunk-stage outputs to the
    compute dtype in the dot epilogue (f32 accumulation unchanged, one
    extra bf16 rounding per stage output), halving the inter-stage HBM
    traffic of the a/b/c/d tensors: 537.7 -> 573.4 MPix/s at B=24
    (scripts/perf_probe23.py).  ``out16="bcd"`` keeps convA's output (the
    widest tensor, feeding every later stage) in f32 and rounds only the
    3x3 stage outputs — measured the best budget-compliant point on the
    quality/throughput frontier (scripts/perf_probe29.py).
    """
    from rusty_sr_tpu.ops.activations import belu
    from rusty_sr_tpu.ops.conv import conv2d_same
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
    from rusty_sr_tpu.ops.resize import bilinear_phases_cropped

    from rusty_sr_tpu.ops.conv import _conv_native

    h = HALO
    p = params
    zero_u8 = zero_tiles if u8_io else None
    if u8_io:
        zero_tiles = zero_tiles.astype(jnp.float32) * (1.0 / 255.0)
        edge_tiles = edge_tiles.astype(jnp.float32) * (1.0 / 255.0)
        mask_tiles = mask_tiles.astype(jnp.float32)
    x = zero_tiles
    mask = mask_tiles

    def o16(name):
        """Does this stage's output round to the compute dtype?"""
        return out16 is True or (out16 == "bcd" and name != "convA")

    def cv(t, name):
        w = p[name]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
            t = t.astype(compute_dtype)
            if name == "convA" or o16(name):
                # convA (5x5 merged, 25x im2col replication) always wins
                # on the native MXU conv emitter (~60 TFLOP/s in-net).
                # The 3x3 stages lose on native with f32 stage outputs
                # (probe21: 36.2 vs 27.4 ms — layout transitions) but WIN
                # once their outputs are bf16 (probe24: 21.3 vs 22.0 ms),
                # so they go native exactly when their output rounds.
                r = _conv_native(t, w, jnp.float32, None)
            else:
                r = conv2d_same(t, w)
            return r.astype(compute_dtype) if o16(name) else r
        return conv2d_same(t, w)

    def up(t):
        """Stage outputs may be bf16 under ``out16``; BeLU math stays f32."""
        return t.astype(jnp.float32) if out16 else t

    def f_activation():
        """Masked BeLU(conv0 + bias).  conv0 reads the RAW IMAGE — bf16-
        rounding it costs the fast tier 3.4 dB for 1.8% of FLOPs, hence
        the u8-exact (k/256 is exact in bf16, 256/255 folded into the
        weights; +1.9 dB free) and two-term-split f32 variants.  On the
        u8 fast path conv0 lowers via 2x2 space-to-depth: Cin=3 strands
        125/128 MXU lanes and made conv0 the biggest line item of the
        pass (6.08 of 27.4 ms); the packed 3x3x12->128 form with bias+
        BeLU applied in packed space and a bf16 unpack measured 524.6 vs
        483.6 MPix/s (scripts/perf_probe20-22.py)."""
        b0, p0 = p["f_bias"], p["f_belu"]
        if compute_dtype is None:
            return mask * belu(conv2d_same(x, p["conv0"]) + b0, p0)  # exact
        if conv0_s2d and zero_u8 is not None and zero_u8.shape[1] % 2 == 0 \
                and zero_u8.shape[2] % 2 == 0:
            nb, sh, sw, ci = zero_u8.shape
            w2f = _conv0_s2d_weights(p["conv0"] * (256.0 / 255.0))
            s = zero_u8.reshape(nb, sh // 2, 2, sw // 2, 2, ci) \
                .transpose(0, 1, 3, 2, 4, 5) \
                .reshape(nb, sh // 2, sw // 2, 4 * ci)
            t8 = s.astype(compute_dtype) * jnp.asarray(2.0 ** -8,
                                                       compute_dtype)
            if conv0_ws:
                # Two-term WEIGHT split (w = hi + lo, both bf16; masked
                # split — see ops.conv.bf16_split) as one K=216 dot over
                # duplicated input channels: with the u8-exact input this
                # reproduces Precision.HIGH-class conv0 accuracy
                # (perf_probe29-34: single-rounded bf16 conv0 weights
                # cost ~1.3 dB fidelity / +0.02 dB GT on the f32
                # protocol).
                from rusty_sr_tpu.ops.conv import bf16_split
                w_hi, w_lo = bf16_split(w2f)
                o = _conv_native(jnp.concatenate([t8, t8], axis=-1),
                                 jnp.concatenate([w_hi, w_lo], axis=2),
                                 jnp.float32, None)
            else:
                o = _conv_native(t8, w2f.astype(compute_dtype),
                                 jnp.float32, None)
            fp = belu(o + jnp.tile(b0, 4),
                      jnp.tile(p0, 4)).astype(compute_dtype)
            no = b0.shape[0]
            f_pre = fp.reshape(nb, sh // 2, sw // 2, 2, 2, no) \
                .transpose(0, 1, 3, 2, 4, 5).reshape(nb, sh, sw, no)
            return mask.astype(compute_dtype) * f_pre
        if zero_u8 is not None:
            # odd tile side: u8-exact native conv0 (no s2d)
            t8 = zero_u8.astype(compute_dtype) * jnp.asarray(
                2.0 ** -8, compute_dtype)
            w0f = p["conv0"] * (256.0 / 255.0)
            if conv0_ws:  # same masked weight-split trick as the s2d branch
                from rusty_sr_tpu.ops.conv import bf16_split
                w_hi, w_lo = bf16_split(w0f)
                c0 = _conv_native(jnp.concatenate([t8, t8], axis=-1),
                                  jnp.concatenate([w_hi, w_lo], axis=2),
                                  jnp.float32, None)
            else:
                c0 = _conv_native(t8, w0f.astype(compute_dtype),
                                  jnp.float32, None)
            return mask * belu(c0 + b0, p0)
        # f32 inputs: two-term bf16 split of image AND weights (masked
        # split — ops.conv.bf16_split; the convert-based split is folded
        # to zero by XLA's allow-excess-precision rewrite, which silently
        # degraded this branch to single-bf16 conv0 for two rounds).
        # The three surviving cross terms (hi*w_hi + hi*w_lo + lo*w_hi;
        # lo*w_lo is below f32 noise) run as ONE K=225 dot —
        # Precision.HIGH-class conv0 (perf_probe29-34).
        from rusty_sr_tpu.ops.conv import bf16_split
        hi, lo = bf16_split(x)
        if conv0_ws:
            w_hi, w_lo = bf16_split(p["conv0"])
            c0 = _conv_native(jnp.concatenate([hi, hi, lo], axis=-1),
                              jnp.concatenate([w_hi, w_lo, w_hi], axis=2),
                              jnp.float32, None)
        else:
            w0 = p["conv0"].astype(compute_dtype)
            c0 = (_conv_native(hi, w0, jnp.float32, None)
                  + _conv_native(lo, w0, jnp.float32, None))
        return mask * belu(c0 + b0, p0)

    n = p["f_bias"].shape[0]
    e = p["expand_bias"].shape[0]
    f_ = f_activation()
    a = cv(f_, "convA")                                  # conv1|conv2|conv3
    l1 = mask * belu(up(a[..., :n]) + p["l1_bias"], p["l1_belu"])
    b = cv(l1, "convB")                                  # conv5|conv6|conv7
    l2 = mask * belu(up(a[..., n:2 * n]) + up(b[..., :n]) + p["l2_bias"],
                     p["l2_belu"])
    c = cv(l2, "convC")                                  # conv8|conv9
    l3 = mask * belu(up(a[..., 2 * n:3 * n]) + up(b[..., n:2 * n])
                     + up(c[..., :n]) + p["l3_bias"], p["l3_belu"])
    expand = (up(b[..., 2 * n:2 * n + e]) + up(c[..., n:n + e])
              + up(cv(l3, "conv10")) + p["expand_bias"])
    # LR-space base (exact f32, channels-outer + pre-cropped — see
    # bilinear_phases_cropped) + halo crop before the single HR-sized op.
    base_ph = bilinear_phases_cropped(edge_tiles, factor, h, h, tile)
    total = base_ph + \
        expand[:, h:h + tile, h:h + tile, :].astype(jnp.float32)
    if u8_io:
        total = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
        return depth_to_space(total, factor).astype(jnp.uint8)
    return depth_to_space(total, factor)


@functools.partial(jax.jit, static_argnames=("factor", "tile", "u8_io"))
def _tile_kernel_q8(q, zero_tiles, edge_tiles, mask_tiles, factor: int,
                    tile: int, u8_io: bool = False):
    """Int8-trunk tile kernel (models.quant v2: calibrated per-channel
    activation scales folded into weights).  Same tiling/mask semantics as
    `_tile_kernel`; the trunk runs int8, base + final sum stay f32."""
    from rusty_sr_tpu.models.quant import q8_expand
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
    from rusty_sr_tpu.ops.resize import bilinear_phases_cropped

    h = HALO
    if u8_io:
        zero_tiles = zero_tiles.astype(jnp.float32) * (1.0 / 255.0)
        edge_tiles = edge_tiles.astype(jnp.float32) * (1.0 / 255.0)
        mask_tiles = mask_tiles.astype(jnp.float32)
    expand = q8_expand(q, zero_tiles, factor, mask=mask_tiles)
    base_ph = bilinear_phases_cropped(edge_tiles, factor, h, h, tile)
    total = base_ph + expand[:, h:h + tile, h:h + tile, :]
    if u8_io:
        total = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
        return depth_to_space(total, factor).astype(jnp.uint8)
    return depth_to_space(total, factor)


@functools.partial(jax.jit, static_argnames=("factor", "tile", "rh",
                                             "compute_dtype"))
def _tile_kernel_fused(packed, zero_tiles, edge_tiles, mask_tiles,
                       factor: int, tile: int, rh: int, compute_dtype):
    """Fused-Pallas engine: trunk in one kernel, base+shuffle in XLA."""
    from rusty_sr_tpu.ops.pallas.trunk import fused_trunk
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
    from rusty_sr_tpu.ops.resize import bilinear_phases_cropped

    h = HALO
    expand = fused_trunk(packed, zero_tiles, mask_tiles, factor, rh=rh,
                         compute_dtype=compute_dtype)
    base_ph = bilinear_phases_cropped(edge_tiles, factor, h, h, tile)
    return depth_to_space(base_ph + expand, factor)


@functools.partial(jax.jit, static_argnames=("factor", "tile", "mode",
                                             "u8_io"))
def _tile_kernel_simple(edge_tiles, factor: int, tile: int, mode: str,
                        u8_io: bool):
    """Fixed-shape tile kernel for the non-neural CLI paths.

    ``bilinear``: sRGB->linear -> half-pixel clamped bilinear xf ->
    linear->sRGB (reference bilinear_net, src/network.rs:111-123).
    ``downsample``: sRGB->linear -> fxf mean pool -> linear->sRGB
    (downsample_net, src/network.rs:125-138; tile % factor == 0).

    Edge-replicated tiles carry real neighbour data at interior tile
    boundaries and reproduce the LinearInterp clamp at true image
    borders; pooling needs no halo at factor-aligned tiles.  Without
    this, each new image size would be a fresh whole-image executable —
    minutes per size on a real TPU.
    """
    from rusty_sr_tpu.ops.color import linear_to_srgb, srgb_to_linear
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
    from rusty_sr_tpu.ops.resize import avg_pool, bilinear_phases_cropped

    h = HALO
    x = edge_tiles.astype(jnp.float32) * (1.0 / 255.0) if u8_io \
        else edge_tiles
    if mode == "bilinear":
        lin = srgb_to_linear(x)
        ph = bilinear_phases_cropped(lin, factor, h, h, tile)
        out = depth_to_space(linear_to_srgb(ph), factor)
    else:
        core = x[:, h:h + tile, h:h + tile, :]
        out = linear_to_srgb(avg_pool(srgb_to_linear(core), factor))
    if u8_io:
        out = jnp.floor(jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5) \
            .astype(jnp.uint8)
    return out


def tiled_simple(image: np.ndarray, factor: int = 3, *, mode: str,
                 tile: int = 240, chunk: Optional[int] = None,
                 device_put: Callable = jax.device_put) -> np.ndarray:
    """Overlap-tile driver for the bilinear / downsample CLI modes: any
    image size through ONE fixed-shape executable (`_tile_kernel_simple`).
    For ``downsample`` the image must already be cropped to a multiple
    of ``factor`` (the CLI does this, matching the reference)."""
    assert mode in ("bilinear", "downsample"), mode
    if mode == "downsample":
        tile -= tile % factor
    u8_io = np.asarray(image).dtype == np.uint8
    img = np.asarray(image) if u8_io else np.asarray(image, np.float32)
    hgt, wid, _ = img.shape
    h = HALO
    ny = max(1, -(-hgt // tile))
    nx = max(1, -(-wid // tile))
    if chunk is None:
        chunk = _DEFAULT_CHUNK
    # The simple kernels need neither zero-pad tiles nor masks — gather
    # edge-padded tiles only (any dtype), instead of paying for three
    # buffers per call on a large-image path.
    et = _gather_edge(img, tile, h, ny, nx)
    side = tile + 2 * h
    n_tiles = ny * nx
    tf = tile * factor if mode == "bilinear" else tile // factor
    oh = hgt * factor if mode == "bilinear" else hgt // factor
    ow = wid * factor if mode == "bilinear" else wid // factor
    out_dtype = np.uint8 if u8_io else np.float32
    out = np.zeros((oh, ow, 3), out_dtype)
    pending: deque = deque()

    def drain_one():
        start, cnt, res = pending.popleft()
        if u8_io:
            _scatter_u8(np.asarray(res[:cnt]), start, nx, tf, out)
        else:
            native.scatter_tiles(np.asarray(res[:cnt]), start, nx, out)

    for start in range(0, n_tiles, chunk):
        stop = min(start + chunk, n_tiles)
        cnt = stop - start
        eb = et[start:stop]
        if cnt < chunk:
            eb = np.concatenate(
                [eb, np.zeros((chunk - cnt, side, side, 3), et.dtype)])
        res = _tile_kernel_simple(device_put(eb), factor, tile, mode, u8_io)
        if hasattr(res, "copy_to_host_async"):
            res.copy_to_host_async()
        pending.append((start, cnt, res))
        if len(pending) >= _MAX_INFLIGHT:
            drain_one()  # bound in-flight chunk memory (see _MAX_INFLIGHT)
    while pending:
        drain_one()
    return out


def _int8_trunk(mparams, sample, u8_io: bool,
                cache: Optional[dict] = None):
    """Calibrated int8 trunk from ``sample`` (zero-pad tiles sampled
    evenly across the image; one exact f32 pass — models/quant).
    First-chunk-only sampling under-covers large images (measured ~-9 dB
    when calibration misses the range, tests/test_quant.py).  ``cache``:
    caller-owned dict for resident processes — calibration runs once and
    is frozen."""
    if cache is not None and "q" in cache:
        return cache["q"]
    from rusty_sr_tpu.models.quant import calibrate_act_scales, quantize_trunk
    if u8_io:
        sample = sample.astype(np.float32) / 255.0
    q = quantize_trunk(mparams, calibrate_act_scales(mparams, sample))
    if cache is not None:
        cache["q"] = q
    return q


def _gather_edge(img: np.ndarray, tile: int, h: int, ny: int, nx: int):
    """Edge-padded tile gather only, any dtype (the bilinear/downsample
    simple kernels use neither zero-pad tiles nor masks)."""
    hgt, wid, ch = img.shape
    pad = ((h, h + ny * tile - hgt), (h, h + nx * tile - wid), (0, 0))
    edge_img = np.pad(img, pad, mode="edge")
    side = tile + 2 * h
    et = np.empty((ny * nx, side, side, ch), img.dtype)
    k = 0
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * tile, ix * tile
            et[k] = edge_img[y0:y0 + side, x0:x0 + side]
            k += 1
    return et


def _gather_u8(img: np.ndarray, tile: int, h: int, ny: int, nx: int,
               need_zero: bool = True):
    """uint8 tile gather (zero-pad, edge-pad, mask) over the whole grid.
    Layout contract (zero/edge/mask ordering, ny*nx row-major slicing)
    mirrors utils/native.gather_tiles' f32 path — keep them in sync."""
    return _gather_u8_range(img, tile, h, nx, 0, ny * nx, need_zero)


def _gather_u8_range(img: np.ndarray, tile: int, h: int, nx: int,
                     t0: int, t1: int, need_zero: bool = True):
    """uint8 tile gather for the range [t0, t1) of the row-major grid,
    straight from the UNPADDED image — O(t1-t0) host memory at any image
    size (no whole-image pad copies; the drivers gather per dispatch
    chunk, VERDICT r4 #5).  Bytes identical to the full gather's
    [t0:t1] slice (pinned in tests/test_tiling.py).
    ``need_zero=False`` returns ``zt=None`` (the packed kernel derives
    zero-pad tiles on device as edge*mask, probe55) — skips one third of
    the host gather AND of the H2D upload."""
    hgt, wid, _ = img.shape
    side = tile + 2 * h
    n = t1 - t0
    zt = np.zeros((n, side, side, 3), np.uint8) if need_zero else None
    et = np.empty((n, side, side, 3), np.uint8)
    mt = np.zeros((n, side, side, 1), np.uint8)
    for k in range(n):
        iy, ix = divmod(t0 + k, nx)
        y0, x0 = iy * tile - h, ix * tile - h
        ylo, yhi = max(y0, 0), min(y0 + side, hgt)
        xlo, xhi = max(x0, 0), min(x0 + side, wid)
        sub = img[ylo:yhi, xlo:xhi]
        ry, rx = ylo - y0, xlo - x0
        et[k] = np.pad(sub, ((ry, side - ry - sub.shape[0]),
                             (rx, side - rx - sub.shape[1]), (0, 0)),
                       mode="edge")
        if need_zero:
            zt[k, ry:ry + sub.shape[0], rx:rx + sub.shape[1]] = sub
        mt[k, ry:ry + sub.shape[0], rx:rx + sub.shape[1]] = 1
    return zt, et, mt


def _scatter_u8(res: np.ndarray, start: int, nx: int, tf: int, out: np.ndarray):
    """Scatter uint8 HR tiles (image-local indices) into `out`."""
    for j in range(res.shape[0]):
        iy, ix = divmod(start + j, nx)
        rows = min(out.shape[0] - iy * tf, tf)
        cols = min(out.shape[1] - ix * tf, tf)
        if rows > 0 and cols > 0:
            out[iy * tf:iy * tf + rows, ix * tf:ix * tf + cols] = \
                res[j, :rows, :cols]


def tiled_sr_batch(params, images, factor: int = 3, *, tile: int = 242,
                   chunk: Optional[int] = None, compute_dtype=None,
                   out16=None,
                   mesh=None,
                   on_image_done: Optional[Callable] = None,
                   release_outputs: bool = False,
                   device_put: Callable = jax.device_put) -> list:
    """Upscale a list of images, batching tiles ACROSS images.

    The per-dispatch fixed costs (host<->device round trips over the
    tunnel, partially-filled final chunks) amortise over the whole set
    instead of being paid per image — the reference has no analogue (one
    `graph.forward` per process run, src/main.rs:171).  All images must
    share the input dtype (all uint8 or all float).  Returns outputs in
    input order (uint8 in => uint8 out).  Engines: exact (f32) or fast
    (``compute_dtype=bf16``) tier only — the int8 trunk was retired from
    the serving drivers (PERF.md probe59: +4.5% for ~8 dB; it stays an
    API-level experiment via ``tiled_sr(engine='int8')``).

    ``mesh``: shard each tile chunk over the mesh's 'data' axis
    (batch-of-tiles DP for the realistic pod workloads — a folder, a
    watch service; VERDICT r3 #3/#5).  The chunk ladder is applied PER
    DEVICE (the HBM cliff it guards is per chip), params replicate, and
    the forward needs no collectives; outputs are byte-identical to the
    single-device path (pinned in tests/test_multichip.py).  "xla"
    engine only.

    ``on_image_done(i, out)``: called from the drain loop (caller's
    thread, ascending i) the moment image i's LAST tile is scattered —
    while later chunks are still computing on device.  Host post-work
    (PNG encode runs 13-19 MPix/s/core vs the chip's 1356 — it, not the
    chip, bounds end-to-end folder serving) overlaps compute instead of
    serialising after it; a callback that blocks (e.g. a bounded writer
    pool) back-pressures dispatch, keeping in-flight memory bounded.  A
    callback exception propagates (the batch fails loudly, not half-
    written).  ``release_outputs=True`` drops the driver's reference
    after the callback (that slot of the returned list is None) so a
    big folder's finished outputs don't accumulate on host.
    """
    if out16 is None:   # bf16-stage-output default for the fast tier
        out16 = compute_dtype is not None
    if not images:
        return []
    imgs = [np.asarray(im) for im in images]
    u8_io = imgs[0].dtype == np.uint8
    if not all((im.dtype == np.uint8) == u8_io for im in imgs):
        # public-API contract (upscale_batch): must survive `python -O`,
        # so not an assert — a mixed u8/f32 list would silently
        # misclassify images and corrupt outputs
        raise ValueError("all images in a batch must share the input "
                         "dtype (uint8 or float)")
    if not u8_io:
        imgs = [np.asarray(im, np.float32) for im in imgs]
    params = trunk_params(params)
    n_data = 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        n_data = mesh.shape["data"]
        sh = NamedSharding(mesh, PartitionSpec("data", None, None, None))
        repl = NamedSharding(mesh, PartitionSpec())
        base_put = device_put
        device_put = lambda x: base_put(x, sh)  # noqa: E731
        params = jax.device_put(params, repl)
    h = HALO
    side = tile + 2 * h
    tf = tile * factor

    use_packed = (compute_dtype is not None and u8_io
                  and (tile + 2 * h) % 2 == 0)
    metas = []   # (ny, nx, H, W) per image — shapes only, no tiles yet
    for img in imgs:
        hgt, wid, _ = img.shape
        metas.append((max(1, -(-hgt // tile)), max(1, -(-wid // tile)),
                      hgt, wid))
    starts = np.cumsum([0] + [m[0] * m[1] for m in metas])  # image offsets
    n_tiles = int(starts[-1])

    def gather_range(g0: int, g1: int):
        # Per-chunk gather straight from the unpadded images: a chunk may
        # span image boundaries, so walk the images the global tile range
        # [g0, g1) intersects and gather each image-local sub-range.
        # Host tile memory stays O(chunk) however large the images are
        # (VERDICT r4 #5); byte-identity vs the upfront gather is pinned
        # in tests/test_tiling.py.
        zps, eps, mps = [], [], []
        i = int(np.searchsorted(starts, g0, side="right")) - 1
        while g0 < g1:
            lo = g0 - int(starts[i])
            hi = min(g1, int(starts[i + 1])) - int(starts[i])
            nx_i = metas[i][1]
            if u8_io:
                zp, ep, mp = _gather_u8_range(imgs[i], tile, h, nx_i,
                                              lo, hi,
                                              need_zero=not use_packed)
            else:
                zp, ep, mp = native.gather_tiles_range(imgs[i], tile, h,
                                                       nx_i, lo, hi)
            zps.append(zp); eps.append(ep); mps.append(mp)
            g0 = int(starts[i + 1])
            i += 1
        if len(eps) == 1:
            return zps[0], eps[0], mps[0]
        zc = None if zps[0] is None else np.concatenate(zps)
        return zc, np.concatenate(eps), np.concatenate(mps)
    if chunk is None:
        # The measured ladder is for the packed kernel only (see
        # _CHUNK_T_MS); other tiers keep the conservative default.
        # Under a mesh, the ladder applies PER DEVICE (per-chip HBM
        # cliff), so the dispatch chunk scales by the data-axis size.
        per_dev = _pick_chunk(max(1, -(-n_tiles // n_data)), tile) \
            if use_packed else _DEFAULT_CHUNK
        chunk = per_dev * n_data
    elif mesh is not None:
        chunk *= n_data   # user chunk is per-device (tiled_sr_sharded)

    out_dtype = np.uint8 if u8_io else np.float32
    outs = [np.zeros((m[2] * factor, m[3] * factor, 3), out_dtype)
            for m in metas]

    if use_packed:
        pp = packed_trunk_params(params, compute_dtype, factor)
        if mesh is not None:    # committed replicated weights on the mesh
            pp = jax.device_put(pp, repl)
        run = lambda z, e, m: _tile_kernel_packed(  # noqa: E731
            pp, z, e, m, factor, tile, compute_dtype)
    else:
        run = lambda z, e, m: _tile_kernel(  # noqa: E731
            params, z, e, m, factor, tile, compute_dtype, u8_io, out16)

    pending: deque = deque()
    img_state = [0]   # image cursor shared with the drain helper
    remain = [m[0] * m[1] for m in metas]   # undrained tiles per image
    drain_args = (starts, metas, outs, img_state, tf, u8_io,
                  remain, on_image_done, release_outputs)
    tdt = np.uint8 if u8_io else np.float32
    for g0 in range(0, n_tiles, chunk):
        g1 = min(g0 + chunk, n_tiles)
        cnt = g1 - g0
        zb, eb, mb = gather_range(g0, g1)
        if cnt < chunk:  # pad the (single) final partial chunk
            fill = chunk - cnt
            if zb is not None:
                zb = np.concatenate(
                    [zb, np.zeros((fill, side, side, 3), tdt)])
            eb = np.concatenate([eb, np.zeros((fill, side, side, 3), tdt)])
            mb = np.concatenate([mb, np.zeros((fill, side, side, 1),
                                              mb.dtype)])
        res = run(None if zb is None else device_put(zb),
                  device_put(eb), device_put(mb))
        if hasattr(res, "copy_to_host_async"):
            res.copy_to_host_async()  # D2H overlaps later chunks' compute
        pending.append((g0, cnt, res))
        if len(pending) >= _MAX_INFLIGHT:
            _drain_batch_chunk(pending, *drain_args)
    while pending:
        _drain_batch_chunk(pending, *drain_args)
    return outs


def _drain_batch_chunk(pending, starts, metas, outs, img_state,
                       tf: int, u8_io: bool, remain=None,
                       on_image_done=None, release_outputs=False):
    """Fetch the OLDEST in-flight chunk and scatter it across the images
    it spans (chunks are global-tile-index contiguous; `img_state`
    carries the image cursor between calls).  When a scatter completes
    an image (its undrained-tile count in `remain` hits 0) the
    completion callback fires immediately — images finish in input
    order, while later chunks are still in flight."""
    g0, cnt, res = pending.popleft()
    res = np.asarray(res[:cnt])
    j = 0
    while j < cnt:  # split the chunk into per-image contiguous runs
        g = g0 + j
        while g >= starts[img_state[0] + 1]:
            img_state[0] += 1
        idx = img_state[0]
        local = g - starts[idx]
        run_len = min(cnt - j, int(starts[idx + 1]) - g)
        nx = metas[idx][1]
        if u8_io:
            _scatter_u8(res[j:j + run_len], local, nx, tf, outs[idx])
        else:
            native.scatter_tiles(res[j:j + run_len], local, nx, outs[idx])
        j += run_len
        if remain is not None:
            remain[idx] -= run_len
            if remain[idx] == 0 and on_image_done is not None:
                on_image_done(idx, outs[idx])
                if release_outputs:
                    outs[idx] = None


# Measured ms/chunk of the PACKED fast-tier kernel (merged-base form) at
# tile=242 on v5e under the HONEST protocol (perf_probe54: every kernel
# input derived from the timing-loop carry, so the per-call edge+mask
# packs that earlier sweeps hoisted are paid); throughput climbs to a
# hard scheduler cliff just past B=112.  Used to pick the chunk that minimises
# ceil(n/c)*t(c) — padding the final chunk is the price of
# one-executable dispatch, so the best c depends on the image's tile
# count.  The ladder applies ONLY to the packed fast-tier kernel: the
# exact/f32/int8 kernels have different (unmeasured) timings and a much
# larger HBM footprint (the flat kernel's convA im2col patches are ~2 MB
# per tile per K-element class — chunk 112 would overrun v5e's 16 GB),
# so those paths keep the conservative `_DEFAULT_CHUNK`.
_CHUNK_T_MS = {1: 2.5, 2: 4.1, 4: 5.8, 8: 6.7, 16: 10.3, 24: 13.7,
               32: 16.8, 40: 19.5, 48: 22.1, 56: 24.6, 64: 27.5,
               80: 32.8, 96: 38.0, 112: 43.5}
_LADDER_TILE = 242      # anchor tile the ladder was measured at
_CLIFF_B = 112          # HBM cliff just past this batch at the anchor
_DEFAULT_CHUNK = 24     # non-packed tiers (measured safe, ~5 GB peak)

# Max dispatched-but-unfetched chunks per driver.  Dispatch-ahead keeps
# device compute, H2D and D2H overlapped across chunks, but every parked
# chunk holds its HR output (+input buffers until consumed) on device and
# host — unbounded, a big folder/image would scale in-flight memory with
# INPUT size and blow the 16 GB HBM that the per-chunk ladder carefully
# respects.  8 chunks ≈ 1.7 GB of parked outputs at the packed tier's
# B=112 (and less elsewhere): deep enough that the fetch loop never
# starves the dispatch queue, bounded enough to stay off the HBM wall.
_MAX_INFLIGHT = 8


def _pick_chunk(n_tiles: int, tile: int = _LADDER_TILE) -> int:
    """Smallest-total-cost chunk for the PACKED fast-tier kernel.

    For non-anchor tiles the ladder is rescaled by padded-tile area:
    kernel time and HBM footprint both scale ~linearly with
    batch x side^2, so a chunk of c tiles at side s costs about what
    c*(s/256)^2 tiles cost at the anchor, and the HBM cliff sits at
    c*(s/256)^2 ~ 112.  Ties -> the larger chunk (fewer dispatches).
    """
    side = tile + 2 * HALO
    area = (side * side) / float((_LADDER_TILE + 2 * HALO) ** 2)
    ws = sorted(_CHUNK_T_MS)
    ts = [_CHUNK_T_MS[w] for w in ws]
    cap = max(1, int(_CLIFF_B / area))
    cands = sorted({min(max(1, int(round(w / area))), cap) for w in ws})
    best, best_cost = cands[0], float("inf")
    for c in cands:
        t = float(np.interp(c * area, ws, ts))
        cost = -(-n_tiles // c) * t
        if cost < best_cost or (cost == best_cost and c > best):
            best, best_cost = c, cost
    return best


def tiled_sr(params, image: np.ndarray, factor: int = 3, *, tile: int = 242,
             chunk: Optional[int] = None, compute_dtype=None, out16=None,
             conv0_s2d: bool = True, conv0_ws: bool = True,
             trunk: str = "auto",
             engine: str = "xla", rh: int = 16, packed=None,
             device_put: Callable = jax.device_put) -> np.ndarray:
    """Upscale (H,W,3) f32 by ``factor`` exactly, any size, one executable.

    ``tile`` is the LR tile side (tile+2*HALO is the padded compute side;
    default 242 ⇒ 256-wide padded tiles, lane-aligned — measured fastest
    on v5e: halo overhead 1.12x vs 1.26x at 114, scripts/perf_probe14.py).
    ``chunk`` bounds
    how many tiles run per device dispatch.  ``engine``: "xla" or "fused"
    (Pallas trunk; pass ``packed`` from pack_trunk_weights to avoid
    repacking, and ``rh`` as the kernel row-block).
    """
    assert engine in ("xla", "int8", "fused"), engine
    if out16 is None:   # bf16-stage-output default for the fast tier
        out16 = compute_dtype is not None
    u8_io = (np.asarray(image).dtype == np.uint8)
    img = np.asarray(image) if u8_io else np.asarray(image, dtype=np.float32)
    if engine == "xla":
        params = trunk_params(params)
    hgt, wid, _ = img.shape
    h = HALO
    ny = max(1, -(-hgt // tile))
    nx = max(1, -(-wid // tile))
    use_packed = (engine == "xla" and trunk != "flat"
                  and compute_dtype is not None and u8_io
                  and (tile + 2 * h) % 2 == 0)
    if chunk is None:
        # The measured ladder applies to the packed fast-tier kernel
        # only; the exact/f32/int8 kernels keep the conservative default
        # (their timings differ and the flat kernel's im2col patches
        # would overrun HBM at ladder-sized chunks).
        chunk = _pick_chunk(ny * nx, tile) if use_packed else _DEFAULT_CHUNK

    def gather_range(g0: int, g1: int):
        # Per-chunk gather straight from the unpadded image: host memory
        # stays O(chunk) at any image size (a gigapixel input no longer
        # materialises ~2.3x its bytes of tiles upfront; VERDICT r4 #5).
        # u8: 4x less host<->device transfer (f32/255 + final quant run
        # on device); the packed kernel additionally derives zero-pad
        # tiles on device (edge*mask, bit-identical — probe55), skipping
        # one third of the gather AND of the upload.
        if u8_io:
            return _gather_u8_range(img, tile, h, nx, g0, g1,
                                    need_zero=not use_packed)
        return native.gather_tiles_range(img, tile, h, nx, g0, g1)

    if engine == "int8":
        # Calibration tiles sampled evenly across the whole image
        # (first-chunk-only sampling measured ~-9 dB, tests/test_quant):
        # gathered individually so streaming still never materialises
        # the full tile set.
        idx = np.unique(np.linspace(0, ny * nx - 1,
                                    min(chunk, ny * nx)).astype(int))
        sample = np.concatenate([gather_range(i, i + 1)[0] for i in idx])
        q = _int8_trunk(trunk_params(params), sample, u8_io)
        run = lambda z, e, mk: _tile_kernel_q8(  # noqa: E731
            q, z, e, mk, factor, tile, u8_io)
    elif engine == "fused":
        assert not u8_io, "u8 I/O is implemented for the xla engine"
        # compute_dtype=None means the EXACT tier on every engine: the
        # fused Pallas trunk runs f32 unless the caller opted into bf16
        # (api.upscale fast=True / CLI --fast), same contract as "xla".
        dt = compute_dtype or jnp.float32
        if packed is None:
            from rusty_sr_tpu.ops.pallas.trunk import pack_trunk_weights
            packed = pack_trunk_weights(
                params, factor,
                dtype=jnp.float32 if dt == jnp.float32 else jnp.bfloat16)
        if tile % rh != 0:  # kernel row-block must divide the tile
            rh = next(d for d in range(rh, 0, -1) if tile % d == 0)
        run = lambda z, e, m: _tile_kernel_fused(  # noqa: E731
            packed, z, e, m, factor, tile, rh, dt)
    elif use_packed:
        # Fast tier, u8, even padded side: the space-to-depth packed
        # trunk (quarter res, 4x channels) — 797 vs 609 MPix/s on v5e
        # (perf_probe36); bf16-class identical products.
        pp = packed_trunk_params(params, compute_dtype, factor)
        run = lambda z, e, m: _tile_kernel_packed(  # noqa: E731
            pp, z, e, m, factor, tile, compute_dtype)
    else:
        run = lambda z, e, m: _tile_kernel(  # noqa: E731
            params, z, e, m, factor, tile, compute_dtype, u8_io, out16,
            conv0_s2d, conv0_ws)

    side = tile + 2 * h
    n_tiles = ny * nx
    out_dtype = np.uint8 if u8_io else np.float32
    out = np.zeros((hgt * factor, wid * factor, 3), out_dtype)
    # Dispatch all chunks first (jax dispatch is async), then fetch+scatter:
    # overlaps device compute/transfer across chunks instead of paying a
    # full round-trip per chunk.  Each chunk's tiles are gathered right
    # before its dispatch (while earlier chunks compute on device), so
    # host tile memory never exceeds ~_MAX_INFLIGHT chunks.
    tdt = img.dtype if u8_io else np.float32
    tf = tile * factor
    pending: deque = deque()

    def drain_one():
        start, cnt, res = pending.popleft()
        if u8_io:
            _scatter_u8(np.asarray(res[:cnt]), start, nx, tf, out)
        else:
            native.scatter_tiles(np.asarray(res[:cnt]), start, nx, out)

    for start in range(0, n_tiles, chunk):
        stop = min(start + chunk, n_tiles)
        cnt = stop - start
        zb, eb, mb = gather_range(start, stop)
        if cnt < chunk:  # pad last chunk: one executable total
            fill = chunk - cnt
            if zb is not None:
                zb = np.concatenate(
                    [zb, np.zeros((fill, side, side, 3), tdt)])
            eb = np.concatenate([eb, np.zeros((fill, side, side, 3), tdt)])
            mb = np.concatenate([mb, np.zeros((fill, side, side, 1), mb.dtype)])
        res = run(None if zb is None else device_put(zb),
                  device_put(eb), device_put(mb))
        if hasattr(res, "copy_to_host_async"):
            res.copy_to_host_async()  # D2H overlaps later chunks' compute
        pending.append((start, cnt, res))
        if len(pending) >= _MAX_INFLIGHT:
            drain_one()  # bound device+host memory held by parked outputs
    while pending:
        drain_one()
    return out

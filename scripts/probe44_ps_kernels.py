"""Phase-split packed trunk — the probe44 measured DEAD END, kept as a
record next to its probe (moved out of parallel/tiling.py per VERDICT r3
hygiene: product modules hold only dispatched code).

The exact 1.78x per-output-phase packing of the 3x3 stages exists and is
numerically bf16-class identical to the production packed kernel (the
agreement test in tests/test_tiling.py pins it), but its four K=512/N=co
dots LOSE 2.4-2.7x to the single K=1152/N=4co dense dot at every batch —
the v5e emitter's super-linear K/N law wins in both directions
(PERF.md probe44).  Nothing in the product dispatches these.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu.parallel.tiling import (HALO, _conv0_s2d_weights,
                                          _s2d_conv_weights, trunk_params)


def _ps_maps(fy: int, fx: int, k: int = 3):
    """Phase-split index maps for an odd k x k Same conv in 2x2 s2d
    space: output phase (fy,fx) needs original rows 2p+fy-c..2p+fy+c
    (c=(k-1)//2), which for k=3 fit in the 2-tap packed-row window
    a in {fy-1, fy} — vs the 3-tap window a dense packing needs for all
    phases at once.  Of the 4 (a,by) combos per dim only 3 carry a valid
    original tap (dy = 2a+by-fy in [-c,c]), so the per-phase dot does
    (4/3)^2 = 1.78x the original MACs instead of the dense form's 4x.
    Returns (uu, vv, ok) of shape (2,2,4): packed tap (ai,bi) with
    a = fy-1+ai, input group g = by*2+bx."""
    c = (k - 1) // 2
    uu = np.zeros((2, 2, 4), np.int32)
    vv = np.zeros_like(uu)
    ok = np.zeros(uu.shape, np.float32)
    for ai in range(2):
        for bi in range(2):
            for by in range(2):
                for bx in range(2):
                    g = by * 2 + bx
                    dy = 2 * (fy - 1 + ai) + by - fy
                    dx = 2 * (fx - 1 + bi) + bx - fx
                    uu[ai, bi, g] = min(max(dy + c, 0), k - 1)
                    vv[ai, bi, g] = min(max(dx + c, 0), k - 1)
                    ok[ai, bi, g] = float(abs(dy) <= c and abs(dx) <= c)
    return uu, vv, ok


def _ps_conv_weights(w):
    """(3,3,ci,co) -> list of 4 (2,2,4ci,co) phase-split kernels
    (phase order ff = fy*2+fx; input channels g-outer: g*ci + c, i.e.
    the f-outer layout of the producing stage).  Trace-safe."""
    k, _, ci, co = w.shape
    out = []
    for fy in range(2):
        for fx in range(2):
            uu, vv, ok = _ps_maps(fy, fx, k)
            wg = w[uu, vv] * ok[..., None, None]      # (2,2,4,ci,co)
            out.append(wg.reshape(2, 2, 4 * ci, co))
    return out


def packed_trunk_params_ps(params, compute_dtype=jnp.bfloat16, factor=3):
    """Phase-split variant of `packed_trunk_params` (round-3 attack on
    the 4x FLOP inflation of the packed 3x3 stages, CLAUDE.md roadmap
    #1): conv0/convA stay dense-packed (5x5 packs at only 1.44x), but
    the 3x3 stages (convB/convC/conv10+base) become FOUR per-output-
    phase dots each — a (2,2) packed-tap window per phase instead of the
    dense (3,3) window, 1.78x MACs instead of 4x (see `_ps_maps`).

    Channel layout is f-outer everywhere (channel = ff*C + c): each
    stage's 4 phase outputs concatenate in phase order, which is exactly
    the g-outer input order the next stage's `_ps_conv_weights` expects,
    and also what conv0's single-block s2d output already is.
    """
    from rusty_sr_tpu.ops.conv import bf16_split
    from rusty_sr_tpu.parallel.tiling import _base_conv_weights
    p = trunk_params(params)
    n = p["f_bias"].shape[0]
    e = p["expand_bias"].shape[0]
    w0f = _conv0_s2d_weights(p["conv0"] * (256.0 / 255.0))
    w0_hi, w0_lo = bf16_split(jnp.asarray(w0f))
    cd = compute_dtype
    base = _base_conv_weights(factor) * (256.0 / 255.0)
    wd_ps = _ps_conv_weights(p["conv10"])
    wb_ps = _ps_conv_weights(jnp.asarray(base))
    WD = []
    for ff in range(4):
        hi, lo = bf16_split(wb_ps[ff])
        WD.append(jnp.concatenate(
            [jnp.asarray(wd_ps[ff]).astype(cd), hi, lo], axis=2))
    out = {
        "W0": jnp.concatenate([w0_hi, w0_lo], axis=2),
        # convA: single-block perm == identity => f-outer output
        "WA": jnp.asarray(_s2d_conv_weights(p["convA"], [3 * n])
                          ).astype(cd),
        "WB": [jnp.asarray(w).astype(cd)
               for w in _ps_conv_weights(p["convB"])],
        "WC": [jnp.asarray(w).astype(cd)
               for w in _ps_conv_weights(p["convC"])],
        "WD": WD,
    }
    for k in ("f_bias", "f_belu", "l1_bias", "l1_belu", "l2_bias",
              "l2_belu", "l3_bias", "l3_belu", "expand_bias"):
        out[k] = jnp.tile(p[k], 4)
    return out


@functools.partial(jax.jit, static_argnames=("factor", "tile",
                                             "compute_dtype"))
def _tile_kernel_packed_ps(pp, zero_tiles, edge_tiles, mask_tiles,
                           factor: int, tile: int,
                           compute_dtype=jnp.bfloat16):
    """Phase-split packed trunk: same tiling/mask semantics and the same
    products as `_tile_kernel_packed` (bf16-class identical; the 3x3
    stage sums just accumulate in 4 per-phase K=512 dots instead of one
    K=1152 dot with 75% structural zeros).  Pinned by the agreement test
    in tests/test_tiling.py as the probe44 record."""
    from jax import lax

    from rusty_sr_tpu.ops.activations import belu
    from rusty_sr_tpu.ops.conv import _conv_native
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space

    h = HALO
    cd = compute_dtype
    nb, sh, sw, ci = zero_tiles.shape
    ph, pw = sh // 2, sw // 2
    n = pp["f_bias"].shape[0] // 4
    e = pp["expand_bias"].shape[0] // 4

    def pack(t):
        c = t.shape[-1]
        return t.reshape(nb, ph, 2, pw, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(nb, ph, pw, 4 * c)

    def blk(t, C, lo, hi):
        """f-outer channel-range slice: (…,4C) -> (…,4*(hi-lo))."""
        s = t.reshape(nb, ph, pw, 4, C)[..., lo:hi]
        return s.reshape(nb, ph, pw, 4 * (hi - lo))

    def ps_cv(t, Ws, accum_f32=False):
        """Four per-phase (2,2)-window VALID convs over the zero-padded
        packed image; concat in phase order = f-outer output."""
        tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = []
        for fy in range(2):
            for fx in range(2):
                v = tp[:, fy:fy + ph + 1, fx:fx + pw + 1, :]
                o = lax.conv_general_dilated(
                    v, Ws[fy * 2 + fx], (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                outs.append(o if accum_f32 else o.astype(cd))
        return jnp.concatenate(outs, axis=-1)

    t8 = pack(zero_tiles).astype(cd) * jnp.asarray(2.0 ** -8, cd)
    te8 = pack(edge_tiles).astype(cd) * jnp.asarray(2.0 ** -8, cd)
    o = _conv_native(jnp.concatenate([t8, t8], -1), pp["W0"],
                     jnp.float32, None)
    m4 = pack(mask_tiles).astype(cd)
    mN = jnp.repeat(m4, n, axis=-1)
    f_ = belu(o + pp["f_bias"], pp["f_belu"]).astype(cd) * mN

    a = _conv_native(f_, pp["WA"], jnp.float32, None).astype(cd)
    l1 = belu(blk(a, 3 * n, 0, n).astype(jnp.float32) + pp["l1_bias"],
              pp["l1_belu"]).astype(cd) * mN
    b = ps_cv(l1, pp["WB"])
    l2 = belu(blk(a, 3 * n, n, 2 * n).astype(jnp.float32)
              + blk(b, 2 * n + e, 0, n).astype(jnp.float32)
              + pp["l2_bias"], pp["l2_belu"]).astype(cd) * mN
    c = ps_cv(l2, pp["WC"])
    l3 = belu(blk(a, 3 * n, 2 * n, 3 * n).astype(jnp.float32)
              + blk(b, 2 * n + e, n, 2 * n).astype(jnp.float32)
              + blk(c, n + e, 0, n).astype(jnp.float32)
              + pp["l3_bias"], pp["l3_belu"]).astype(cd) * mN
    d = ps_cv(jnp.concatenate([l3, te8, te8], -1), pp["WD"],
              accum_f32=True)               # conv10 + BASE, f32 accum
    total = (blk(b, 2 * n + e, 2 * n, 2 * n + e).astype(jnp.float32)
             + blk(c, n + e, n, n + e).astype(jnp.float32)
             + d + pp["expand_bias"])
    tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5) \
        .astype(jnp.uint8)
    ex = tq.reshape(nb, ph, pw, 2, 2, e) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(nb, sh, sw, e)
    return depth_to_space(ex[:, h:h + tile, h:h + tile, :], factor)

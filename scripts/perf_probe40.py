"""Probe 40: fold the bilinear base INTO the conv10 dot; host-side pack.

Probe 39 (B=112 packed profile): MXU stages run at 88-99% of peak
(convA 195 TF/s) — the remaining time is the base+quant+d2s tail
(15.8 ms of 46.8) and the input s2d permutation (3.1 ms).  Both are
structural, not compute:

1. The bilinear base is a fixed 3x3 conv at LR (phase taps span <1 px
   for every factor), so its packed, weight-SPLIT form rides as extra K
   rows of the conv10 dot (K 1152 -> 1368, ~+0.7 ms) reading the packed
   edge tiles; the sum expand+base happens inside the f32 accumulator,
   quantisation runs in packed space, and the whole HR-sized f32 tail
   disappears.  Base accuracy: u8-exact input x split weights =
   Precision.HIGH class (~2^-17) — far below a u8 code.
2. Pack the tiles on the HOST (numpy u8 reshape, overlapped with device
   work) instead of a 3 ms device permutation.

  v0 : product anchor (_tile_kernel_packed)
  v1 : base-in-conv10 (device pack)
  v2 : base-in-conv10 + host pack
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import (trunk_params, packed_trunk_params,
                                          HALO, _tile_kernel_packed,
                                          _s2d_conv_weights)
from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import _conv_native, bf16_split
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space

F, TILE, B = 3, 242, 112
H = HALO
SIDE = TILE + 2 * H
P = SIDE // 2
CD = jnp.bfloat16
ITERS = 10

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
pp = dict(packed_trunk_params(params, CD))
rng = np.random.default_rng(0)


def base_conv_weights(f, C=3):
    """(3,3,C,f*f*C): LinearInterp xf as a Same conv at LR — output
    channel (fy*f+fx)*C + c matches the expand/d2s order (SURVEY 8.6)."""
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


# merged conv10 weights: [WD | base_hi | base_lo] along input channels
wb = _s2d_conv_weights(base_conv_weights(F) * (256.0 / 255.0),
                       [F * F * 3])                        # (3,3,12,108)
wb_hi, wb_lo = bf16_split(jnp.asarray(wb))
WD_M = jnp.concatenate([pp["WD"], wb_hi, wb_lo], axis=2)   # (3,3,152,108)


def pack_u8(t):
    nb, sh, sw, c = t.shape
    return t.reshape(nb, sh // 2, 2, sw // 2, 2, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(nb, sh // 2, sw // 2, 4 * c)


@functools.partial(jax.jit, static_argnames=("host_packed",))
def merged_kernel(zero_t, edge_t, mask_t, host_packed=False):
    n = 32
    N = 4 * n
    e27 = 27
    if host_packed:
        s, se, m4 = zero_t, edge_t, mask_t
    else:
        s, se, m4 = pack_u8(zero_t), pack_u8(edge_t), pack_u8(mask_t)
    t8 = s.astype(CD) * jnp.asarray(2.0 ** -8, CD)
    te8 = se.astype(CD) * jnp.asarray(2.0 ** -8, CD)
    o = _conv_native(jnp.concatenate([t8, t8], -1), pp["W0"],
                     jnp.float32, None)
    mN = jnp.repeat(m4.astype(CD), n, axis=-1)
    f_ = belu(o + pp["f_bias"], pp["f_belu"]).astype(CD) * mN
    cv = lambda t, W: _conv_native(t, W, jnp.float32, None).astype(CD)  # noqa
    up = lambda t: t.astype(jnp.float32)  # noqa
    a = cv(f_, pp["WA"])
    l1 = belu(up(a[..., :N]) + pp["l1_bias"], pp["l1_belu"]).astype(CD) * mN
    b = cv(l1, pp["WB"])
    l2 = belu(up(a[..., N:2 * N]) + up(b[..., :N]) + pp["l2_bias"],
              pp["l2_belu"]).astype(CD) * mN
    c = cv(l2, pp["WC"])
    l3 = belu(up(a[..., 2 * N:3 * N]) + up(b[..., N:2 * N])
              + up(c[..., :N]) + pp["l3_bias"], pp["l3_belu"]) \
        .astype(CD) * mN
    # conv10 + BASE in one dot (f32 accumulation holds the sum)
    d = _conv_native(jnp.concatenate([l3, te8, te8], -1), WD_M,
                     jnp.float32, None)
    total = (up(b[..., 2 * N:2 * N + 4 * e27]) + up(c[..., N:N + 4 * e27])
             + d + pp["expand_bias"])
    tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    ex = tq.reshape(-1, P, P, 2, 2, e27) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(-1, SIDE, SIDE, e27)
    return depth_to_space(ex[:, H:H + TILE, H:H + TILE, :], F)


def time_fn(name, fn, args):
    z8 = args[0]

    def body(i, carry):
        xx, s = carry
        out = fn(xx, *args[1:])
        dd = jnp.max(out)
        xx = xx.at[(0,) * xx.ndim].add(dd.astype(xx.dtype))
        return xx, s + dd.astype(jnp.float32)

    @jax.jit
    def loop(xx):
        return lax.fori_loop(0, ITERS, body, (xx, jnp.float32(0.0)))

    t0 = time.perf_counter()
    jax.block_until_ready(loop(z8))
    comp = time.perf_counter() - t0
    best = 1e30
    for r in range(3):
        xr = jnp.asarray((np.asarray(z8) + r + 1).astype(np.uint8))
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(xr))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    mpix = B * (TILE * F) ** 2 / 1e6 / per
    print(f"{name:12s}: {per * 1e3:7.2f} ms/pass  {mpix:7.1f} MPix/s "
          f"(compile {comp:.0f}s)", flush=True)


def main():
    z8n = (rng.random((B, SIDE, SIDE, 3)) * 255).astype(np.uint8)
    z8 = jnp.asarray(z8n)
    m8n = np.ones((B, SIDE, SIDE, 1), np.uint8)
    m8 = jnp.asarray(m8n)

    ref = np.asarray(_tile_kernel_packed(pp2 := packed_trunk_params(
        params, CD), z8, z8, m8, F, TILE, CD))
    out = np.asarray(merged_kernel(z8, z8, m8))
    diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    print(f"merged u8 diff vs product: max {diff.max()} "
          f"frac>0 {np.mean(diff > 0):.2e}", flush=True)

    time_fn("v0 product",
            lambda zz, ee, mm: _tile_kernel_packed(pp2, zz, ee, mm, F,
                                                   TILE, CD),
            (z8, z8, m8))
    time_fn("v1 merged", lambda zz, ee, mm: merged_kernel(zz, ee, mm),
            (z8, z8, m8))

    def hp(t):
        nb, sh, sw, c = t.shape
        return np.ascontiguousarray(
            t.reshape(nb, sh // 2, 2, sw // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(nb, sh // 2, sw // 2,
                                                 4 * c))

    zp = jnp.asarray(hp(z8n))
    mp = jnp.asarray(hp(m8n))
    out2 = np.asarray(merged_kernel(zp, zp, mp, host_packed=True))
    diff2 = np.abs(out2.astype(np.int16) - ref.astype(np.int16))
    print(f"hostpack u8 diff vs product: max {diff2.max()} "
          f"frac>0 {np.mean(diff2 > 0):.2e}", flush=True)
    time_fn("v2 hostpack",
            lambda zz, ee, mm: merged_kernel(zz, ee, mm, host_packed=True),
            (zp, zp, mp))


if __name__ == "__main__":
    main()

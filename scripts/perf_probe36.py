"""Probe 36: FULLY-PACKED trunk — every stage in 2x2 space-to-depth space.

Probe 35: the emitter's rate scales super-linearly with K/N at these
shapes (K 288->1152: 12.6->66.8 TF/s), so quarter-resolution/4x-channel
packed convs beat the full-res forms in wall-clock at every stage even
at their true FLOP inflation (convA 1.44x, 3x3 stages 4x — the packed
kernel needs kt=3 taps for odd k; the 1.78x "2x2 kernel" variant in
PERF.md's old note cannot represent a 3x3 conv exactly).

Design: pack once (u8 s2d), run conv0/A/B/C/10 entirely packed with
block-major output channel grouping (stage slices stay contiguous —
no lane shuffles), unpack a single time at the 27-channel expand tail.
Same products as the production kernel => bf16-class-identical.

  v0 : production anchor (596-601 MPix/s)
  v1 : packed trunk
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import (trunk_params, HALO, _tile_kernel,
                                          _conv0_s2d_weights)
from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import _conv_native, bf16_split
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases_cropped

F, TILE = 3, 242
H = HALO
SIDE = TILE + 2 * H
P = SIDE // 2
CD = jnp.bfloat16
ITERS = 10

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
rng = np.random.default_rng(0)


def _maps_k(k):
    """s2d2 index maps for an odd k x k Same conv: packed tap (ap,bp) in
    a 3x3 window (center 1), u = 2*ap + by - fy + (c - 2), c=(k-1)//2 —
    the k=5 instance reproduces tiling._s2d_index_maps exactly."""
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


def s2d_w(w, blocks):
    """(k,k,ci,co) -> (3,3,4ci,4co) packed weights, output channels
    grouped BLOCK-major: for sub-block b (widths `blocks`, sum == co),
    packed channel = 4*offset_b + ff*width_b + c_b — so every stage
    slice is a contiguous range and per-channel params are jnp.tile(p,4)
    within each block."""
    w = np.asarray(w, np.float32)
    k, _, ci, co = w.shape
    assert sum(blocks) == co
    uu, vv, ok = _maps_k(k)
    wg = w[uu, vv] * ok[..., None, None]          # (3,3,4g,4f,ci,co)
    wflat = wg.transpose(0, 1, 2, 4, 3, 5).reshape(3, 3, 4 * ci, 4 * co)
    perm = np.empty(4 * co, np.int64)
    off = 0
    for wb in blocks:
        for ff in range(4):
            for cb in range(wb):
                perm[4 * off + ff * wb + cb] = ff * co + off + cb
        off += wb
    return jnp.asarray(wflat[..., perm])


def t4(v):
    return jnp.tile(v, 4)


def make_packed(nb):
    p = params
    w0f = _conv0_s2d_weights(p["conv0"] * (256.0 / 255.0))
    w0_hi, w0_lo = bf16_split(jnp.asarray(w0f))
    W0 = jnp.concatenate([w0_hi, w0_lo], axis=2)
    WA = s2d_w(p["convA"], [32, 32, 32]).astype(CD)
    WB = s2d_w(p["convB"], [32, 32, 27]).astype(CD)
    WC = s2d_w(p["convC"], [32, 27]).astype(CD)
    WD = s2d_w(p["conv10"], [27]).astype(CD)

    def one(z8, e8, m8):
        nb_, sh, sw, ci = z8.shape
        s = z8.reshape(nb_, P, 2, P, 2, 3).transpose(0, 1, 3, 2, 4, 5) \
            .reshape(nb_, P, P, 12)
        t8 = s.astype(CD) * jnp.asarray(2.0 ** -8, CD)
        o = _conv_native(jnp.concatenate([t8, t8], -1), W0,
                         jnp.float32, None)
        m4 = m8.reshape(nb_, P, 2, P, 2, 1).transpose(0, 1, 3, 2, 4, 5) \
            .reshape(nb_, P, P, 4).astype(CD)
        m128 = jnp.repeat(m4, 32, axis=-1)
        f_ = (belu(o + t4(p["f_bias"]), t4(p["f_belu"])).astype(CD) * m128)

        def cv(t, W):
            return _conv_native(t, W, jnp.float32, None).astype(CD)

        def up(t):
            return t.astype(jnp.float32)

        a = cv(f_, WA)
        l1 = (belu(up(a[..., :128]) + t4(p["l1_bias"]), t4(p["l1_belu"]))
              .astype(CD) * m128)
        b = cv(l1, WB)
        l2 = (belu(up(a[..., 128:256]) + up(b[..., :128]) + t4(p["l2_bias"]),
                   t4(p["l2_belu"])).astype(CD) * m128)
        c = cv(l2, WC)
        l3 = (belu(up(a[..., 256:384]) + up(b[..., 128:256])
                   + up(c[..., :128]) + t4(p["l3_bias"]),
                   t4(p["l3_belu"])).astype(CD) * m128)
        d = cv(l3, WD)
        exp_pk = (up(b[..., 256:364]) + up(c[..., 128:236]) + up(d)
                  + t4(p["expand_bias"]))
        e = exp_pk.reshape(nb_, P, P, 2, 2, 27) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(nb_, SIDE, SIDE, 27)
        base_ph = bilinear_phases_cropped(
            e8.astype(jnp.float32) * (1.0 / 255.0), F, H, H, TILE)
        total = base_ph + e[:, H:H + TILE, H:H + TILE, :]
        tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
        return depth_to_space(tq, F).astype(jnp.uint8)

    return one


def time_fn(name, one, z8, e8, m8, nb):
    def body(i, carry):
        xx, s = carry
        out = one(xx, e8, m8)
        d = jnp.max(out)
        xx = xx.at[(0,) * xx.ndim].add(d.astype(xx.dtype))
        return xx, s + d.astype(jnp.float32)

    @jax.jit
    def loop(xx):
        return lax.fori_loop(0, ITERS, body, (xx, jnp.float32(0.0)))

    try:
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
        mpix = nb * (TILE * F) ** 2 / 1e6 / per
        print(f"{name:10s}: {per * 1e3:7.2f} ms/pass  {mpix:6.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def main():
    nb = 24
    z8 = jnp.asarray((rng.random((nb, SIDE, SIDE, 3)) * 255)
                     .astype(np.uint8))
    m8 = jnp.asarray(np.ones((nb, SIDE, SIDE, 1), np.uint8))

    def prod(zz, ee, mm):
        return _tile_kernel(params, zz, ee, mm, F, TILE, CD, True, True)

    packed = make_packed(nb)
    ref = np.asarray(jax.jit(prod)(z8, z8, m8))
    out = np.asarray(jax.jit(packed)(z8, z8, m8))
    diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    print(f"packed u8 diff vs product: max {diff.max()} "
          f"frac>0 {np.mean(diff > 0):.2e}", flush=True)
    time_fn("v0 product", prod, z8, z8, m8, nb)
    time_fn("v1 packed", packed, z8, z8, m8, nb)


if __name__ == "__main__":
    main()

"""Probe 27: 4x4 space-to-depth conv0 (K=192, N=512) vs the 2x2 form.

conv0 is 3.7 ms of the 21.3 ms pass at 2.9 TFLOP/s — the worst rate in
the net (K=108, N=128 after the 2x2 s2d).  Packing 4x4 LR blocks turns
the 5x5 conv into a 2x2x48->512 conv at quarter resolution:
K=192, N=512, at 2.56x the FLOPs of the direct form (zeros in the packed
weights) vs 1.44x for the 2x2 form.  Wins iff the emitter rate at
(K=192,N=512) exceeds ~2.6x the (K=108,N=128) rate.  Same numerical
content: every product is an original conv0 product (u8-exact /256
trick preserved).

  v0 anchor : production kernel (s2d2 conv0)
  v1 s2d4   : 4x4 space-to-depth conv0
  v2 s2d4nb : same but unpack straight to bf16 (skip f32 round-trip)

RESULT (v5e, B=24): v0 594.7 | v1 592.7 | v2 582.9 MPix/s — and the v1/v2
numerics are WRONG (the 2-tap index map below misses the +2 center
offset; the correct r=4 packing needs u = 4*(ap-1) + by - fy + 2, i.e.
3x3 packed taps = 5.76x FLOP inflation, not 2.56x).  The wrong version
is still a valid *perf* upper bound at the 2x2x48->512 shape: perf-
neutral at 2.56x inflation means the correct 5.76x form loses outright.
The r=2 form (1.44x inflation, 3x3x12->128) is the optimum of the
s2d-conv0 family on this chip.  DEAD END — do not revisit.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import trunk_params, HALO, _tile_kernel
from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import _conv_native
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases_cropped

F, TILE = 3, 242
H = HALO
SIDE = TILE + 2 * H
CD = jnp.bfloat16
ITERS = 10
R = 4  # s2d block

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
rng = np.random.default_rng(0)


def _s2d_maps(r, k):
    """Index maps for r x r space-to-depth of a k x k Same conv."""
    kt = -(-(k - 1 + r) // r)  # packed kernel taps per axis
    uu = np.zeros((kt, kt, r * r, r * r), np.int32)
    vv = np.zeros_like(uu)
    ok = np.zeros(uu.shape, np.float32)
    for ap in range(kt):
        for bp in range(kt):
            for by in range(r):
                for bx in range(r):
                    for fy in range(r):
                        for fx in range(r):
                            g, ff = by * r + bx, fy * r + fx
                            u, v = r * ap + by - fy, r * bp + bx - fx
                            uu[ap, bp, g, ff] = min(max(u, 0), k - 1)
                            vv[ap, bp, g, ff] = min(max(v, 0), k - 1)
                            ok[ap, bp, g, ff] = float(
                                0 <= u < k and 0 <= v < k)
    return uu, vv, ok


UU, VV, OK = _s2d_maps(R, 5)


def s2d_weights(w0):
    ci, co = w0.shape[2], w0.shape[3]
    wg = w0[UU, VV] * OK[..., None, None]      # (kt,kt,r2,r2,ci,co)
    kt = wg.shape[0]
    return wg.transpose(0, 1, 2, 4, 3, 5).reshape(kt, kt, R * R * ci,
                                                  R * R * co)


def make_kernel(nb, straight_bf16=False):
    p = params

    def one(z8):
        w2 = s2d_weights(p["conv0"] * (256.0 / 255.0)).astype(CD)
        s = z8.reshape(nb, SIDE // R, R, SIDE // R, R, 3) \
              .transpose(0, 1, 3, 2, 4, 5) \
              .reshape(nb, SIDE // R, SIDE // R, R * R * 3)
        t8 = s.astype(CD) * jnp.asarray(2.0 ** -8, CD)
        o = _conv_native(t8, w2, jnp.float32, None)
        if straight_bf16:
            o = o.astype(CD)
        fp = belu(o + jnp.tile(p["f_bias"], R * R).astype(o.dtype),
                  jnp.tile(p["f_belu"], R * R).astype(o.dtype)).astype(CD)
        f_ = fp.reshape(nb, SIDE // R, SIDE // R, R, R, 32) \
               .transpose(0, 1, 3, 2, 4, 5).reshape(nb, SIDE, SIDE, 32)

        def cv(t, name):
            return _conv_native(t.astype(CD), p[name].astype(CD),
                                jnp.float32, None).astype(CD)

        def up(t):
            return t.astype(jnp.float32)

        n, e27 = 32, 27
        a = cv(f_, "convA")
        l1 = belu(up(a[..., :n]) + p["l1_bias"], p["l1_belu"])
        b = cv(l1, "convB")
        l2 = belu(up(a[..., n:2 * n]) + up(b[..., :n]) + p["l2_bias"],
                  p["l2_belu"])
        c = cv(l2, "convC")
        l3 = belu(up(a[..., 2 * n:3 * n]) + up(b[..., n:2 * n])
                  + up(c[..., :n]) + p["l3_bias"], p["l3_belu"])
        d = cv(l3, "conv10")
        expand = up(b[..., 2 * n:2 * n + e27]) + up(c[..., n:n + e27]) \
            + up(d[..., :e27]) + p["expand_bias"]
        total = bilinear_phases_cropped(
            z8.astype(jnp.float32) * (1.0 / 255.0), F, H, H, TILE) \
            + expand[:, H:H + TILE, H:H + TILE, :]
        tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
        return depth_to_space(tq, F).astype(jnp.uint8)

    return one


def time_chained(name, one, x0, nb):
    def body(i, carry):
        xx, s = carry
        out = one(xx)
        d = jnp.max(out)
        xx = xx.at[(0,) * xx.ndim].add(d.astype(xx.dtype))
        return xx, s + d.astype(jnp.float32)

    @jax.jit
    def loop(xx):
        return lax.fori_loop(0, ITERS, body, (xx, jnp.float32(0.0)))

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        comp = time.perf_counter() - t0
        best = 1e30
        for r in range(3):
            xr = jnp.asarray((np.asarray(x0) + r + 1).astype(np.uint8))
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(xr))
            best = min(best, time.perf_counter() - t0)
        per = best / ITERS
        mpix = nb * (TILE * F) ** 2 / 1e6 / per
        print(f"{name:12s}: {per * 1e3:7.2f} ms/pass  {mpix:6.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def main():
    nb = 24
    z8 = jnp.asarray((rng.random((nb, SIDE, SIDE, 3)) * 255)
                     .astype(np.uint8))
    m = jnp.asarray(np.ones((nb, SIDE, SIDE, 1), np.uint8))

    def prod(zz):
        return _tile_kernel(params, zz, zz, m, F, TILE, CD, True, True)

    ref = np.asarray(jax.jit(prod)(z8))
    time_chained("v0 product", prod, z8, nb)
    for name, kw in [("v1 s2d4", dict()),
                     ("v2 s2d4nb", dict(straight_bf16=True))]:
        one = make_kernel(nb, **kw)
        out = np.asarray(jax.jit(one)(z8))
        diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
        print(f"{name:12s}  u8 diff: max {diff.max()} "
              f"frac>0 {np.mean(diff > 0):.2e}", flush=True)
        time_chained(name, one, z8, nb)


if __name__ == "__main__":
    main()

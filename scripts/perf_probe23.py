"""Probe 23: bf16 stage outputs + batch re-sweep on the integrated kernel.

After s2d-conv0 + nchw-base (522 MPix/s), the pass is dominated by the
four conv stages.  Their f32 outputs (a 603 / b 573 / c 372 / d 170 MB
at B=24) are each written once and re-read 1-3x by the BeLU sums and the
expand assembly.  Casting the dot outputs to bf16 in the epilogue (f32
accumulation unchanged, one extra rounding per element) halves that
inter-stage traffic.

  v0 anchor   : integrated kernel (production _tile_kernel fast path)
  v1 out16    : convA/B/C/10 outputs cast bf16; BeLU sums upcast to f32
  v2 out16+ex : v1 + expand assembly kept in bf16 until the final f32 add

Then a tile-batch sweep (16/20/24/28/32) of the best variant — the
optimum moved before (24 at the old balance, perf_probe18/19).
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
from rusty_sr_tpu.ops.conv import conv2d_same, _conv_native
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases_cropped

TILE, F = 242, 3
H = HALO
SIDE = TILE + 2 * H
CD = jnp.bfloat16
ITERS = 10

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
rng = np.random.default_rng(0)


def make_kernel(nb, out16=False, expand16=False):
    p = params

    def one(z8):
        w2 = _conv0_s2d_weights(p["conv0"] * (256.0 / 255.0)).astype(CD)
        s = z8.reshape(nb, SIDE // 2, 2, SIDE // 2, 2, 3) \
              .transpose(0, 1, 3, 2, 4, 5).reshape(nb, SIDE // 2, SIDE // 2, 12)
        t8 = s.astype(CD) * jnp.asarray(2.0 ** -8, CD)
        o = _conv_native(t8, w2, jnp.float32, None)
        fp = belu(o + jnp.tile(p["f_bias"], 4),
                  jnp.tile(p["f_belu"], 4)).astype(CD)
        f_ = fp.reshape(nb, SIDE // 2, SIDE // 2, 2, 2, 32) \
               .transpose(0, 1, 3, 2, 4, 5).reshape(nb, SIDE, SIDE, 32)

        def cv(t, name, native=False):
            w = p[name].astype(CD)
            t = t.astype(CD)
            r = _conv_native(t, w, jnp.float32, None) if native \
                else conv2d_same(t, w)
            return r.astype(CD) if out16 else r

        def up(t):
            return t.astype(jnp.float32) if out16 else t

        n, e27 = 32, 27
        a = cv(f_, "convA", True)
        l1 = belu(up(a[..., :n]) + p["l1_bias"], p["l1_belu"])
        b = cv(l1, "convB")
        l2 = belu(up(a[..., n:2 * n]) + up(b[..., :n]) + p["l2_bias"],
                  p["l2_belu"])
        c = cv(l2, "convC")
        l3 = belu(up(a[..., 2 * n:3 * n]) + up(b[..., n:2 * n])
                  + up(c[..., :n]) + p["l3_bias"], p["l3_belu"])
        d = cv(l3, "conv10")
        if expand16:
            expand = (b[..., 2 * n:2 * n + e27].astype(CD)
                      + c[..., n:n + e27].astype(CD) + d.astype(CD))
            ex = expand[:, H:H + TILE, H:H + TILE, :].astype(jnp.float32) \
                + p["expand_bias"]
        else:
            expand = up(b[..., 2 * n:2 * n + e27]) + up(c[..., n:n + e27]) \
                + up(d) + p["expand_bias"]
            ex = expand[:, H:H + TILE, H:H + TILE, :]
        total = bilinear_phases_cropped(
            z8.astype(jnp.float32) * (1.0 / 255.0), F, H, H, TILE) + ex
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
        print(f"{name:16s}: {per * 1e3:7.2f} ms/pass  {mpix:6.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
        return per
    except Exception as e:
        print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main():
    nb = 24
    z8 = jnp.asarray((rng.random((nb, SIDE, SIDE, 3)) * 255)
                     .astype(np.uint8))
    e = z8
    m = jnp.asarray(np.ones((nb, SIDE, SIDE, 1), np.uint8))

    def prod(zz):
        return _tile_kernel(params, zz, e, m, F, TILE, CD, True)

    ref = np.asarray(jax.jit(prod)(z8))
    time_chained("v0 product", prod, z8, nb)
    for name, kw in [("v1 out16", dict(out16=True)),
                     ("v2 out16+ex", dict(out16=True, expand16=True))]:
        one = make_kernel(nb, **kw)
        out = np.asarray(jax.jit(one)(z8))
        diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
        print(f"{name:16s}  u8 diff vs product: max {diff.max()} "
              f"frac>0 {np.mean(diff > 0):.2e}", flush=True)
        time_chained(name, one, z8, nb)

    print("== batch sweep (production kernel) ==", flush=True)
    for nb2 in (16, 20, 28, 32):
        z2 = jnp.asarray((rng.random((nb2, SIDE, SIDE, 3)) * 255)
                         .astype(np.uint8))
        m2 = jnp.asarray(np.ones((nb2, SIDE, SIDE, 1), np.uint8))
        time_chained(f"prod B={nb2}",
                     lambda zz, m2=m2: _tile_kernel(params, zz, zz, m2, F,
                                                    TILE, CD, True),
                     z2, nb2)


if __name__ == "__main__":
    main()

"""Probe 25: N-padded native 3x3 stages, conv0 epilogue dtype, fine B sweep.

At 592 MPix/s (21.3 ms/pass) the stages are conv0-s2d 3.7 / convA 4.4 /
convB+C+10 ~9.2 / base+quant 2.8.  conv10 (N=27) runs at ~7 TFLOP/s vs
convB (N=91) at ~23 — maybe the native emitter likes N at sublane
multiples:

  v0 anchor : production kernel (native BCD, out16)
  v1 npad   : convB/C/conv10 zero-padded to N=96/64/32 (padding sits at
              the channel tail, so every slice index is unchanged except
              conv10's output, sliced back to 27)
  v2 c0cd   : conv0-s2d output cast to bf16 in the conv epilogue, BeLU
              in bf16 (halves the packed 201 MB f32 intermediate)
  then B in {20, 22, 26} around the 24 optimum.
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
from rusty_sr_tpu.ops.conv import _conv_native
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases_cropped

F, TILE = 3, 242
H = HALO
SIDE = TILE + 2 * H
CD = jnp.bfloat16
ITERS = 10

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
rng = np.random.default_rng(0)


def padded_params():
    p = dict(params)
    for k, tgt in (("convB", 96), ("convC", 64), ("conv10", 32)):
        w = p[k]
        p[k] = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, tgt - w.shape[3])))
    return p


def make_kernel(nb, npad=False, c0cd=False):
    p = padded_params() if npad else params

    def one(z8):
        w2 = _conv0_s2d_weights(p["conv0"] * (256.0 / 255.0)).astype(CD)
        s = z8.reshape(nb, SIDE // 2, 2, SIDE // 2, 2, 3) \
              .transpose(0, 1, 3, 2, 4, 5) \
              .reshape(nb, SIDE // 2, SIDE // 2, 12)
        t8 = s.astype(CD) * jnp.asarray(2.0 ** -8, CD)
        if c0cd:
            o = _conv_native(t8, w2, jnp.float32, None).astype(CD)
        else:
            o = _conv_native(t8, w2, jnp.float32, None)
        fp = belu(o + jnp.tile(p["f_bias"], 4).astype(o.dtype),
                  jnp.tile(p["f_belu"], 4).astype(o.dtype)).astype(CD)
        f_ = fp.reshape(nb, SIDE // 2, SIDE // 2, 2, 2, 32) \
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
    for name, kw in [("v1 npad", dict(npad=True)),
                     ("v2 c0cd", dict(c0cd=True)),
                     ("v3 both", dict(npad=True, c0cd=True))]:
        one = make_kernel(nb, **kw)
        out = np.asarray(jax.jit(one)(z8))
        diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
        print(f"{name:12s}  u8 diff: max {diff.max()} "
              f"frac>0 {np.mean(diff > 0):.2e}", flush=True)
        time_chained(name, one, z8, nb)

    for nb2 in (20, 22, 26):
        z2 = jnp.asarray((rng.random((nb2, SIDE, SIDE, 3)) * 255)
                         .astype(np.uint8))
        m2 = jnp.asarray(np.ones((nb2, SIDE, SIDE, 1), np.uint8))
        time_chained(f"prod B={nb2}",
                     lambda zz, m2=m2: _tile_kernel(params, zz, zz, m2, F,
                                                    TILE, CD, True, True),
                     z2, nb2)


if __name__ == "__main__":
    main()

"""Probe 24: prefix profile of the 574-MPix/s kernel + tile-size sweep.

Section 1 re-runs the chained prefix profile (perf_probe20 method) on the
CURRENT production kernel (s2d conv0, out16 stage outputs, nchw base) to
find the next biggest line item.

Section 2:
- bcd=native rematch under out16 (the f32->bf16 stage outputs change the
  layout-copy economics that made native lose in probe21);
- tile-size sweep at constant ~tile-area: side 256 (tile 242, B=24) vs
  side 384 (tile 370, B=10/11) vs side 512 (tile 498, B=6): halo overhead
  1.119 -> 1.077 -> 1.056.
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

F = 3
H = HALO
CD = jnp.bfloat16
ITERS = 10

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
rng = np.random.default_rng(0)


def stages(z8, nstage, nb, side, tile, bcd_native=False):
    p = params
    w2 = _conv0_s2d_weights(p["conv0"] * (256.0 / 255.0)).astype(CD)
    s = z8.reshape(nb, side // 2, 2, side // 2, 2, 3) \
          .transpose(0, 1, 3, 2, 4, 5).reshape(nb, side // 2, side // 2, 12)
    t8 = s.astype(CD) * jnp.asarray(2.0 ** -8, CD)
    o = _conv_native(t8, w2, jnp.float32, None)
    fp = belu(o + jnp.tile(p["f_bias"], 4),
              jnp.tile(p["f_belu"], 4)).astype(CD)
    f_ = fp.reshape(nb, side // 2, side // 2, 2, 2, 32) \
           .transpose(0, 1, 3, 2, 4, 5).reshape(nb, side, side, 32)
    if nstage == 1:
        return f_

    def cv(t, name, native=False):
        w = p[name].astype(CD)
        t = t.astype(CD)
        r = _conv_native(t, w, jnp.float32, None) if native \
            else conv2d_same(t, w)
        return r.astype(CD)

    def up(t):
        return t.astype(jnp.float32)

    n, e27 = 32, 27
    a = cv(f_, "convA", True)
    if nstage == 2:
        return a
    l1 = belu(up(a[..., :n]) + p["l1_bias"], p["l1_belu"])
    b = cv(l1, "convB", bcd_native)
    if nstage == 3:
        return b
    l2 = belu(up(a[..., n:2 * n]) + up(b[..., :n]) + p["l2_bias"],
              p["l2_belu"])
    c = cv(l2, "convC", bcd_native)
    if nstage == 4:
        return c
    l3 = belu(up(a[..., 2 * n:3 * n]) + up(b[..., n:2 * n])
              + up(c[..., :n]) + p["l3_bias"], p["l3_belu"])
    d = cv(l3, "conv10", bcd_native)
    if nstage == 5:
        return d
    expand = up(b[..., 2 * n:2 * n + e27]) + up(c[..., n:n + e27]) + up(d) \
        + p["expand_bias"]
    total = bilinear_phases_cropped(
        z8.astype(jnp.float32) * (1.0 / 255.0), F, H, H, tile) \
        + expand[:, H:H + tile, H:H + tile, :]
    tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
    if nstage == 6:
        return tq
    return depth_to_space(tq, F).astype(jnp.uint8)


def time_chained(name, one, x0, useful_mpix=None):
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
        extra = ""
        if useful_mpix is not None:
            extra = f"  {useful_mpix / per:6.1f} MPix/s"
        print(f"{name:16s}: {per * 1e3:7.2f} ms/pass{extra} "
              f"(compile {comp:.0f}s)", flush=True)
        return per
    except Exception as e:
        print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main():
    nb, tile = 24, 242
    side = tile + 2 * H
    z8 = jnp.asarray((rng.random((nb, side, side, 3)) * 255)
                     .astype(np.uint8))
    print("== prefix profile (current kernel: s2d+out16+nchw)", flush=True)
    labels = ["conv0-s2d", "+convA", "+convB", "+convC", "+conv10",
              "+base+quant", "+d2s"]
    prev = 0.0
    for ns, lab in enumerate(labels, start=1):
        per = time_chained(
            f"S{ns} {lab}",
            lambda zz, ns=ns: stages(zz, ns, nb, side, tile), z8)
        if per is not None:
            print(f"{'':16s}  delta {1e3 * (per - prev):+7.2f} ms",
                  flush=True)
            prev = per

    print("== bcd native rematch under out16", flush=True)
    time_chained("bcd-nat out16",
                 lambda zz: stages(zz, 7, nb, side, tile, bcd_native=True),
                 z8, nb * (tile * F) ** 2 / 1e6)

    print("== tile-size sweep (production kernel)", flush=True)
    m24 = jnp.asarray(np.ones((nb, side, side, 1), np.uint8))
    time_chained("t242 B24",
                 lambda zz: _tile_kernel(params, zz, zz, m24, F, tile,
                                         CD, True, True),
                 z8, nb * (tile * F) ** 2 / 1e6)
    for t2, b2 in ((370, 10), (370, 11), (498, 6)):
        s2 = t2 + 2 * H
        zz2 = jnp.asarray((rng.random((b2, s2, s2, 3)) * 255)
                          .astype(np.uint8))
        mm2 = jnp.asarray(np.ones((b2, s2, s2, 1), np.uint8))
        time_chained(f"t{t2} B{b2}",
                     lambda zz, t2=t2, mm2=mm2: _tile_kernel(
                         params, zz, zz, mm2, F, t2, CD, True, True),
                     zz2, b2 * (t2 * F) ** 2 / 1e6)


if __name__ == "__main__":
    main()

"""Probe 43: merged-kernel tail profile (B=112) — chained prefixes.

Where do the last ~7 ms beyond the conv10 dot go?  Prefixes:
  P0 through d (conv10+base dot, f32 in packed space)
  P1 + total sum + packed quantisation (u8 packed)
  P2 + unpack/crop/d2s (the full kernel)
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import (trunk_params, packed_trunk_params,
                                          HALO)
from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import _conv_native
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space

F, TILE, B = 3, 242, 112
H = HALO
SIDE = TILE + 2 * H
P = SIDE // 2
CD = jnp.bfloat16
ITERS = 10

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
pp = packed_trunk_params(params, CD, F)
rng = np.random.default_rng(0)


def net(z8, m4s, upto):
    n, e27 = 32, 27
    N = 4 * n
    s = z8.reshape(-1, P, 2, P, 2, 3).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(-1, P, P, 12)
    t8 = s.astype(CD) * jnp.asarray(2.0 ** -8, CD)
    o = _conv_native(jnp.concatenate([t8, t8], -1), pp["W0"],
                     jnp.float32, None)
    mN = jnp.repeat(m4s, n, axis=-1)
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
    d = _conv_native(jnp.concatenate([l3, t8, t8], -1), pp["WD"],
                     jnp.float32, None)
    if upto == 0:
        return d
    total = (up(b[..., 2 * N:2 * N + 4 * e27]) + up(c[..., N:N + 4 * e27])
             + d + pp["expand_bias"])
    tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    if upto == 1:
        return tq
    ex = tq.reshape(-1, P, P, 2, 2, e27) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(-1, SIDE, SIDE, e27)
    return depth_to_space(ex[:, H:H + TILE, H:H + TILE, :], F)


def time_prefix(upto, z8, m4s):
    def body(i, carry):
        xx, ss = carry
        out = net(xx, m4s, upto)
        dd = jnp.max(out).astype(jnp.float32)
        return xx.at[(0,) * 4].add(dd.astype(xx.dtype)), ss + dd

    @jax.jit
    def loop(xx):
        return lax.fori_loop(0, ITERS, body, (xx, jnp.float32(0.0)))

    jax.block_until_ready(loop(z8))
    best = 1e30
    for r in range(3):
        xr = jnp.asarray((np.asarray(z8) + r + 1).astype(np.uint8))
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(xr))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


if __name__ == "__main__":
    z8 = jnp.asarray((rng.random((B, SIDE, SIDE, 3)) * 255)
                     .astype(np.uint8))
    m4s = jnp.ones((B, P, P, 4), CD)
    prev = 0.0
    for upto, name in enumerate(["through conv10+base dot",
                                 "+ sum + packed quant",
                                 "+ unpack/crop/d2s"]):
        t = time_prefix(upto, z8, m4s)
        print(f"{name:26s} prefix {t * 1e3:7.2f} ms  "
              f"stage {(t - prev) * 1e3:+6.2f} ms", flush=True)
        prev = t

"""Probe 39: chained prefix profile of the PACKED kernel (B=112).

Where do the 48.2 ms/pass go now?  Same methodology as perf_probe20
(the only honest per-stage timing on this backend): time jitted chained
PREFIXES of the kernel and difference consecutive prefixes.  Roadmap
input for the next round of attacks.
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
from rusty_sr_tpu.ops.resize import bilinear_phases_cropped

F, TILE, B = 3, 242, 112
H = HALO
SIDE = TILE + 2 * H
P = SIDE // 2
CD = jnp.bfloat16
ITERS = 10

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
pp = packed_trunk_params(params, CD)
rng = np.random.default_rng(0)


def stages(z8, e8, m4s, upto):
    n = 32
    N = 4 * n
    e27 = 27
    s = z8.reshape(-1, P, 2, P, 2, 3).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(-1, P, P, 12)
    t8 = s.astype(CD) * jnp.asarray(2.0 ** -8, CD)
    if upto == 0:
        return t8
    o = _conv_native(jnp.concatenate([t8, t8], -1), pp["W0"],
                     jnp.float32, None)
    mN = jnp.repeat(m4s, n, axis=-1)
    f_ = belu(o + pp["f_bias"], pp["f_belu"]).astype(CD) * mN
    if upto == 1:
        return f_
    a = _conv_native(f_, pp["WA"], jnp.float32, None).astype(CD)
    if upto == 2:
        return a
    up = lambda t: t.astype(jnp.float32)  # noqa: E731
    l1 = belu(up(a[..., :N]) + pp["l1_bias"], pp["l1_belu"]).astype(CD) * mN
    b = _conv_native(l1, pp["WB"], jnp.float32, None).astype(CD)
    if upto == 3:
        return b
    l2 = belu(up(a[..., N:2 * N]) + up(b[..., :N]) + pp["l2_bias"],
              pp["l2_belu"]).astype(CD) * mN
    c = _conv_native(l2, pp["WC"], jnp.float32, None).astype(CD)
    if upto == 4:
        return c
    l3 = belu(up(a[..., 2 * N:3 * N]) + up(b[..., N:2 * N])
              + up(c[..., :N]) + pp["l3_bias"], pp["l3_belu"]) \
        .astype(CD) * mN
    d = _conv_native(l3, pp["WD"], jnp.float32, None).astype(CD)
    if upto == 5:
        return d
    exp_pk = (up(b[..., 2 * N:2 * N + 4 * e27]) + up(c[..., N:N + 4 * e27])
              + up(d) + pp["expand_bias"])
    ex = exp_pk.reshape(-1, P, P, 2, 2, e27) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(-1, SIDE, SIDE, e27)
    if upto == 6:
        return ex
    base_ph = bilinear_phases_cropped(
        e8.astype(jnp.float32) * (1.0 / 255.0), F, H, H, TILE)
    total = base_ph + ex[:, H:H + TILE, H:H + TILE, :]
    tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
    return depth_to_space(tq, F).astype(jnp.uint8)


NAMES = ["pack+cast", "conv0+belu", "convA", "convB+l1", "convC+l2",
         "conv10+l3", "expand+unpack", "base+quant+d2s"]


def time_prefix(upto, z8, e8, m4s):
    def body(i, carry):
        xx, s = carry
        out = stages(xx, e8, m4s, upto)
        d = jnp.max(out).astype(jnp.float32)
        xx = xx.at[(0,) * xx.ndim].add(d.astype(xx.dtype))
        return xx, s + d

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


def main():
    z8 = jnp.asarray((rng.random((B, SIDE, SIDE, 3)) * 255)
                     .astype(np.uint8))
    e8 = z8
    m4s = jnp.ones((B, P, P, 4), CD)
    prev = 0.0
    for upto in range(8):
        t = time_prefix(upto, z8, e8, m4s)
        print(f"{NAMES[upto]:16s} prefix {t * 1e3:7.2f} ms  "
              f"stage {(t - prev) * 1e3:+7.2f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()

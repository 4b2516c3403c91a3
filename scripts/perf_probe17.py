"""Probe 17: conv-lowering mixes not yet measured + tile-shape tail.

Round-1 measured all-native (357), conv0+BCD-native (339), conv0+CD-native
(399) vs all-im2col+conv0-native (438).  NOT measured: convA native (the
5x5 stage with the 25x patch replication — 3.4GB of the ~7GB pass HBM)
with B/C/D im2col.  Variants at u8/bf16, useful-MPix methodology:

  N0   - shipped kernel (conv0 native-u8exact, A/B/C/D im2col)   [baseline]
  NA   - + convA native
  NAB  - + convA,convB native
  t370 - shipped kernel at tile=370 (384-wide padded), batch 8
  t306 - shipped kernel at tile=306 (320-wide padded), batch 12
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools
import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import trunk_params, HALO
from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import conv2d_same, _conv_native
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases

FACTOR = 3
ITERS = 20


@functools.partial(jax.jit, static_argnames=("tile", "native_set"))
def kernel_mix(p, zero_u8, edge_u8, mask_u8, tile: int, native_set: tuple):
    h = HALO
    mask = mask_u8.astype(jnp.float32)
    cd = jnp.bfloat16

    def cv(t, name):
        tb, wb = t.astype(cd), p[name].astype(cd)
        if name in native_set:
            return _conv_native(tb, wb, jnp.float32, None)
        return conv2d_same(tb, wb)

    t8 = zero_u8.astype(cd) * jnp.asarray(2.0 ** -8, cd)
    w0 = (p["conv0"] * (256.0 / 255.0)).astype(cd)
    c0 = _conv_native(t8, w0, jnp.float32, None)
    n = p["f_bias"].shape[0]
    e = p["expand_bias"].shape[0]
    f_ = mask * belu(c0 + p["f_bias"], p["f_belu"])
    a = cv(f_, "convA")
    l1 = mask * belu(a[..., :n] + p["l1_bias"], p["l1_belu"])
    b = cv(l1, "convB")
    l2 = mask * belu(a[..., n:2 * n] + b[..., :n] + p["l2_bias"], p["l2_belu"])
    c = cv(l2, "convC")
    l3 = mask * belu(a[..., 2 * n:3 * n] + b[..., n:2 * n] + c[..., :n]
                     + p["l3_bias"], p["l3_belu"])
    expand = (b[..., 2 * n:2 * n + e] + c[..., n:n + e] + cv(l3, "conv10")
              + p["expand_bias"])
    ef = edge_u8.astype(jnp.float32) * (1.0 / 255.0)
    base_ph = bilinear_phases(ef, FACTOR)[:, h:h + tile, h:h + tile]
    total = base_ph + expand[:, h:h + tile, h:h + tile, :].astype(jnp.float32)
    total = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
    return depth_to_space(total, FACTOR).astype(jnp.uint8)


def bench(tile, batch, native_set, params):
    side = tile + 2 * HALO
    rng = np.random.default_rng(0)
    z = jnp.asarray((rng.random((batch, side, side, 3)) * 255)
                    .astype(np.uint8))
    e = z
    m = jnp.asarray(np.ones((batch, side, side, 1), np.uint8))

    def one(zz):
        out = kernel_mix(params, zz, e, m, tile, native_set)
        return jnp.bitwise_xor(out[:, :side, :side, :], zz)

    @jax.jit
    def chained(zz):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: one(c), zz)

    jax.block_until_ready(chained(z))
    useful = batch * (tile * FACTOR) ** 2 / 1e6
    best = 0.0
    for r in range(3):
        zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
        jax.block_until_ready(zr)
        t0 = time.perf_counter()
        jax.block_until_ready(chained(zr))
        best = max(best, ITERS * useful / (time.perf_counter() - t0))
    return best


def main():
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    cases = [
        ("N0   t242 b16", 242, 16, ()),
        ("NA   t242 b16", 242, 16, ("convA",)),
        ("NAB  t242 b16", 242, 16, ("convA", "convB")),
        ("N0   t370 b8 ", 370, 8, ()),
        ("N0   t306 b12", 306, 12, ()),
    ]
    for name, tile, batch, ns in cases:
        mp = bench(tile, batch, ns, params)
        print(f"{name}: {mp:7.1f} useful MPix/s", flush=True)


if __name__ == "__main__":
    main()

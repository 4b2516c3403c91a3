"""Probe 16: XLA-level output-path variants of the u8 tile kernel.

Cost model says the final segment (phases-concat+cast ~2.3ms, d2s ~2.8ms
at 16x256^2) is ~24% of the pass.  Variants at tile=242, batch=16, u8:

A. shipped kernel (quantise f32 -> d2s f32 -> cast u8)
B. quantise -> cast u8 BEFORE d2s (HR transpose moves 1B/px, not 4)
C. B + base phases computed on the 1-px support crop instead of the full
   padded tile (saves ~11% of the phase FMAs)
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools
import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import _tile_kernel, trunk_params, HALO
from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import conv2d_same, _conv_native
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases

FACTOR = 3
ITERS = 20
TILE, BATCH = 242, 16
SIDE = TILE + 2 * HALO


@functools.partial(jax.jit, static_argnames=("variant",))
def kernel_var(p, zero_u8, edge_u8, mask_u8, variant: str):
    h, tile = HALO, TILE
    x = zero_u8.astype(jnp.float32) * (1.0 / 255.0)
    mask = mask_u8.astype(jnp.float32)
    cd = jnp.bfloat16

    def cv(t, name):
        return conv2d_same(t.astype(cd), p[name].astype(cd))

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

    if variant == "C":
        eshrunk = edge_u8[:, h - 1:h + tile + 1, h - 1:h + tile + 1, :] \
            .astype(jnp.float32) * (1.0 / 255.0)
        base_ph = bilinear_phases(eshrunk, FACTOR)[:, 1:1 + tile, 1:1 + tile]
    else:
        ef = edge_u8.astype(jnp.float32) * (1.0 / 255.0)
        base_ph = bilinear_phases(ef, FACTOR)[:, h:h + tile, h:h + tile]
    total = base_ph + expand[:, h:h + tile, h:h + tile, :].astype(jnp.float32)
    total = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
    if variant == "A":
        return depth_to_space(total, FACTOR).astype(jnp.uint8)
    return depth_to_space(total.astype(jnp.uint8), FACTOR)


def bench(run_fn, z):
    def one(zz):
        out = run_fn(zz)
        return jnp.bitwise_xor(out[:, :SIDE, :SIDE, :], zz)

    @jax.jit
    def chained(zz):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: one(c), zz)

    jax.block_until_ready(chained(z))
    useful = BATCH * (TILE * FACTOR) ** 2 / 1e6
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
    rng = np.random.default_rng(0)
    z = jnp.asarray((rng.random((BATCH, SIDE, SIDE, 3)) * 255)
                    .astype(np.uint8))
    e = z
    m = jnp.asarray(np.ones((BATCH, SIDE, SIDE, 1), np.uint8))

    ref = np.asarray(_tile_kernel(params, z, e, m, FACTOR, TILE,
                                  jnp.bfloat16, True))
    for v in ("A", "B", "C"):
        out = np.asarray(kernel_var(params, z, e, m, v))
        err = np.abs(out.astype(np.int32) - ref.astype(np.int32)).max()
        mp = bench(lambda zz: kernel_var(params, zz, e, m, v), z)
        print(f"variant {v}: {mp:7.1f} MPix/s  (max err vs shipped: {err})",
              flush=True)


if __name__ == "__main__":
    main()

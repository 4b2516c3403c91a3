"""Probe 15: int8-v2 tile kernel vs bf16 tile kernel on the real chip.

v1's per-tensor dynamic int8 measured +11% at 45 dB.  v2 (asymmetric
per-channel, double-dot weights, conv10 bf16, no runtime reductions)
should keep the patch-byte halving on convA/B/C while removing the
serialising max-abs reductions.  Same methodology as perf_probe14.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.quant import calibrate_act_scales, quantize_trunk
from rusty_sr_tpu.parallel.tiling import (
    _tile_kernel, _tile_kernel_q8, trunk_params, HALO)

FACTOR = 3
ITERS = 20


def bench(run_fn, z, side, tile, batch):
    def one(zz):
        out = run_fn(zz)
        return jnp.bitwise_xor(out[:, :side, :side, :], zz)

    @jax.jit
    def chained(zz):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: one(c), zz)

    jax.block_until_ready(chained(z))
    useful_mpix = batch * (tile * FACTOR) ** 2 / 1e6
    best = 0.0
    for r in range(3):
        zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
        jax.block_until_ready(zr)
        t0 = time.perf_counter()
        jax.block_until_ready(chained(zr))
        best = max(best, ITERS * useful_mpix / (time.perf_counter() - t0))
    return best


def main():
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    rng = np.random.default_rng(0)
    calib = rng.random((4, 256, 256, 3), dtype=np.float32)
    q = quantize_trunk(params, calibrate_act_scales(params, calib))

    for tile, batch in ((242, 16), (242, 32), (498, 4), (498, 8)):
        side = tile + 2 * HALO
        z = jnp.asarray((rng.random((batch, side, side, 3)) * 255)
                        .astype(np.uint8))
        e = z
        m = jnp.asarray(np.ones((batch, side, side, 1), np.uint8))
        bf = bench(lambda zz: _tile_kernel(params, zz, e, m, FACTOR, tile,
                                           jnp.bfloat16, True),
                   z, side, tile, batch)
        q8 = bench(lambda zz: _tile_kernel_q8(q, zz, e, m, FACTOR, tile, True),
                   z, side, tile, batch)
        print(f"tile={tile} batch={batch}: bf16 {bf:7.1f}  int8 {q8:7.1f} "
              f"MPix/s ({q8 / bf - 1:+.1%})", flush=True)


if __name__ == "__main__":
    main()

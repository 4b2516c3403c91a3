"""Probe 14: merged-conv _tile_kernel throughput on the real chip.

Round-2 question (VERDICT item 2): after porting the convA/B/C merged
structure into the product tile kernel, what does the PRODUCT path
actually sustain, and which tile size wins?  Halo overhead scales as
((tile+2h)/tile)^2: 1.26x at tile=114, 1.12x at 242, 1.057x at 498 —
bigger tiles amortise the halo but reduce dispatch granularity.

Methodology: device-resident tiles, iterations chained inside jit with a
data dependency, inputs varied between timed rounds (CLAUDE.md timing
rules).  Useful throughput counts only the de-haloed output pixels.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import _tile_kernel, trunk_params, HALO

FACTOR = 3
ITERS = 20


def bench_tile(params, tile, batch, u8_io, compute_dtype=jnp.bfloat16):
    side = tile + 2 * HALO
    rng = np.random.default_rng(0)
    if u8_io:
        z = (rng.random((batch, side, side, 3)) * 255).astype(np.uint8)
        e = z.copy()
        m = np.ones((batch, side, side, 1), np.uint8)
    else:
        z = rng.random((batch, side, side, 3), dtype=np.float32)
        e = z.copy()
        m = np.ones((batch, side, side, 1), np.float32)
    z, e, m = map(jnp.asarray, (z, e, m))

    def one(zz):
        out = _tile_kernel(params, zz, e, m, FACTOR, tile, compute_dtype, u8_io)
        lr = out[:, :side, :side, :]
        if u8_io:
            return jnp.bitwise_xor(lr, zz)
        return lr * 1e-6 + zz

    @jax.jit
    def chained(zz):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: one(c), zz)

    jax.block_until_ready(chained(z))
    useful_mpix = batch * (tile * FACTOR) ** 2 / 1e6
    best = 0.0
    for r in range(3):
        if u8_io:
            zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
        else:
            zr = z * (1.0 + 1e-4 * (r + 1))
        jax.block_until_ready(zr)
        t0 = time.perf_counter()
        jax.block_until_ready(chained(zr))
        dt = time.perf_counter() - t0
        best = max(best, ITERS * useful_mpix / dt)
    return best


def main():
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    combos = [
        (114, 64, False), (114, 64, True),
        (242, 16, False), (242, 16, True),
        (498, 4, False), (498, 4, True),
        (242, 32, True), (114, 128, True),
    ]
    for tile, batch, u8 in combos:
        mp = bench_tile(params, tile, batch, u8)
        print(f"tile={tile:4d} batch={batch:4d} u8={int(u8)} -> "
              f"{mp:8.1f} useful HR MPix/s", flush=True)


if __name__ == "__main__":
    main()

"""Probe 18: sweep around the new optimum (convA native, probe17 +8%).

Variants (all u8/bf16, convA native unless noted):
  NA   t242 b16  - new shipped config                       [baseline]
  NAD  t242 b16  - + conv10 native
  NA   t242 b24  - batch tail
  NA   t242 b32  - batch tail
  NA   t498 b4   - big-tile tail
  NA   t306 b12  - 320-wide padded tiles
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import trunk_params, HALO
from perf_probe17 import kernel_mix  # same mix kernel

FACTOR = 3
ITERS = 20


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
    A = ("convA",)
    cases = [
        ("NA   t242 b16", 242, 16, A),
        ("NAD  t242 b16", 242, 16, ("convA", "conv10")),
        ("NA   t242 b24", 242, 24, A),
        ("NA   t242 b32", 242, 32, A),
        ("NA   t498 b4 ", 498, 4, A),
        ("NA   t306 b12", 306, 12, A),
    ]
    for name, tile, batch, ns in cases:
        mp = bench(tile, batch, ns, params)
        print(f"{name}: {mp:7.1f} useful MPix/s", flush=True)


if __name__ == "__main__":
    main()

"""Probe 38: packed-trunk batch/tile frontier (north-star push).

Probe 37: packed throughput climbs with batch — B=48 hit 1011 MPix/s
(north star crossed).  Sweep further: bigger B at tile 242, and larger
tiles (packed side doubles to 256 lanes at tile 498 — halo overhead
1.057x vs 1.119x) at matched pixel counts.
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
                                          HALO, _tile_kernel_packed)

F = 3
H = HALO
CD = jnp.bfloat16
ITERS = 10

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
pp = packed_trunk_params(params, CD)
rng = np.random.default_rng(0)


def time_bt(nb, tile):
    side = tile + 2 * H
    z8 = jnp.asarray((rng.random((nb, side, side, 3)) * 255)
                     .astype(np.uint8))
    m = jnp.asarray(np.ones((nb, side, side, 1), np.uint8))

    def one(zz):
        return _tile_kernel_packed(pp, zz, zz, m, F, tile, CD)

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
        jax.block_until_ready(loop(z8))
        comp = time.perf_counter() - t0
        best = 1e30
        for r in range(3):
            xr = jnp.asarray((np.asarray(z8) + r + 1).astype(np.uint8))
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(xr))
            best = min(best, time.perf_counter() - t0)
        per = best / ITERS
        mpix = nb * (tile * F) ** 2 / 1e6 / per
        print(f"B={nb:3d} tile={tile:3d}: {per * 1e3:7.2f} ms/pass "
              f"{mpix:7.1f} MPix/s (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"B={nb:3d} tile={tile:3d}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    for nb in (64, 96, 128, 56, 40):
        time_bt(nb, 242)
    for nb, tile in ((12, 498), (16, 498), (24, 498), (4, 1010), (6, 1010)):
        time_bt(nb, tile)

# appended fine sweep (run as probe38b): peak hunt around B=96
if os.environ.get("P38B"):
    pass

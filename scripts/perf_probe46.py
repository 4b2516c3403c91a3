"""probe46: root-cause the B=116+ HBM cliff of the packed kernel
(round-3 roadmap #4 / VERDICT r2 #6).

Round-2 observation: throughput climbs to B=112 (38.3 ms), collapses at
B=120/128 (~700 MPix/s class), yet B=144 oddly ran at 1442.  Sweep the
batch range with (a) chained timing and (b) per-B device memory stats in
fresh executables, to see whether the collapse tracks peak HBM (paging /
spill) or an emitter/scheduler shape effect.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import (HALO, _tile_kernel_packed,
                                          packed_trunk_params,
                                          trunk_params)

ITERS = 8


def main():
    tile = 242
    side = tile + 2 * HALO
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    pp = packed_trunk_params(params, jnp.bfloat16, 3)
    dev = jax.devices()[0]
    batches = [int(b) for b in sys.argv[1:]] or \
        [104, 112, 116, 120, 128, 136, 144, 152, 160]
    for B in batches:
        rng = np.random.default_rng(0)
        z = jnp.asarray((rng.random((B, side, side, 3)) * 255)
                        .astype(np.uint8))
        e = z
        m = jnp.asarray(np.ones((B, side, side, 1), np.uint8))

        def one(zz):
            out = _tile_kernel_packed(pp, zz, e, m, 3, tile, jnp.bfloat16)
            return jnp.bitwise_xor(out[:, :side, :side, :], zz)

        @jax.jit
        def chained(zz):
            return jax.lax.fori_loop(0, ITERS, lambda i, c: one(c), zz)

        t0 = time.perf_counter()
        jax.block_until_ready(chained(z))
        comp = time.perf_counter() - t0
        best = float("inf")
        for r in range(3):
            zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
            jax.block_until_ready(zr)
            t0 = time.perf_counter()
            jax.block_until_ready(chained(zr))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        stats = dev.memory_stats() or {}
        rate = B * (tile * 3) ** 2 / 1e6 / best
        print(f"B={B:3d}: {best * 1e3:7.2f} ms/pass  {rate:7.1f} MPix/s  "
              f"peak={stats.get('peak_bytes_in_use', 0) / 1e9:.2f} GB  "
              f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

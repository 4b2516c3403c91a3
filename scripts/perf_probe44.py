"""probe44: phase-split packed trunk vs dense packed trunk (round-3
roadmap #1 — attack the 4x FLOP inflation of the packed 3x3 stages).

The dense form runs each 3x3 stage as ONE (3,3) packed conv, K=1152,
N=4co, 4x the original MACs (75% structural zeros in the weights).  The
phase-split form runs 4 per-output-phase (2,2)-window convs, K=512,
N=co, 1.78x MACs — 0.44x the FLOPs of dense but narrower N per dot.
FLOP totals per LR px: dense ~327k MACs, ps ~211k (conv0/convA shared).
If the emitter rate at (K=512, N=91..128) holds within ~2.2x of the
(K=1152, N=364..512) rate, ps wins.

Chained in-jit timing, varied inputs per round (bench.py rules).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import (HALO, _tile_kernel_packed,
                                          packed_trunk_params,
                                          trunk_params)
# the measured-loser ps kernels moved here (VERDICT r3 hygiene)
from probe44_ps_kernels import (_tile_kernel_packed_ps,  # noqa: E402
                                packed_trunk_params_ps)

ITERS = 10


def bench(kern, pp, batch, tile=242, rounds=3):
    side = tile + 2 * HALO
    rng = np.random.default_rng(0)
    z = jnp.asarray((rng.random((batch, side, side, 3)) * 255)
                    .astype(np.uint8))
    e = z
    m = jnp.asarray(np.ones((batch, side, side, 1), np.uint8))

    def one(zz):
        out = kern(pp, zz, e, m, 3, tile, jnp.bfloat16)
        return jnp.bitwise_xor(out[:, :side, :side, :], zz)

    @jax.jit
    def chained(zz):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: one(c), zz)

    t0 = time.perf_counter()
    jax.block_until_ready(chained(z))
    comp = time.perf_counter() - t0
    best = float("inf")
    for r in range(rounds):
        zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
        jax.block_until_ready(zr)
        t0 = time.perf_counter()
        jax.block_until_ready(chained(zr))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    mpix = batch * (tile * 3) ** 2 / 1e6
    return best, mpix / best, comp


def main():
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    pp_d = packed_trunk_params(params, jnp.bfloat16, 3)
    pp_p = packed_trunk_params_ps(params, jnp.bfloat16, 3)
    for batch in (24, 64, 112):
        for name, kern, pp in (("dense", _tile_kernel_packed, pp_d),
                               ("ps", _tile_kernel_packed_ps, pp_p)):
            dt, rate, comp = bench(kern, pp, batch)
            print(f"B={batch:3d} {name:5s}: {dt * 1e3:7.2f} ms/pass  "
                  f"{rate:7.1f} MPix/s  (compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

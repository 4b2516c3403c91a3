"""probe52: does a LARGER tile beat 242 for the packed fast tier?

Halo overhead at tile=242 (padded side 256) is (256/242)^2-1 = 11.9% of
the computed pixels; tile=498 (side 512) cuts that to 5.7% and keeps the
packed-space width a multiple of 128 lanes (512/2 = 256), tile=754 (side
768 -> 384) cuts it to 3.8%.  tile=370 (side 384 -> packed width 192,
1.5 lane groups) is the misalignment control.  If the emitter rate holds
at the bigger shapes, the useful-pixel rate should rise by the halo
delta; the B=112 HBM-footprint equivalent is scaled as B*side^2 ~= const.

Protocol: bench.py's chained fori_loop with per-round varied inputs.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

SWEEP = [
    (242, 112),            # anchor (the product ladder's optimum)
    (498, 20), (498, 24), (498, 28),
    (754, 10), (754, 12),
    (370, 44),             # misaligned packed width control
]
ITERS = 10
FACTOR = 3


def main():
    from rusty_sr_tpu.utils.platform import ensure_device_or_respawn
    ensure_device_or_respawn()
    from rusty_sr_tpu import load_builtin
    from rusty_sr_tpu.parallel.tiling import (_tile_kernel_packed,
                                              packed_trunk_params,
                                              trunk_params, HALO)

    params = packed_trunk_params(trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}))
    rng = np.random.default_rng(0)

    for tile, batch in SWEEP:
        side = tile + 2 * HALO
        z0 = (rng.random((batch, side, side, 3)) * 255).astype(np.uint8)
        m = jnp.asarray(np.ones((batch, side, side, 1), np.uint8))

        def one_pass(zz, e=None):
            out = _tile_kernel_packed(params, zz, zz, m, FACTOR, tile,
                                      jnp.bfloat16)
            return jnp.bitwise_xor(out[:, :side, :side, :], zz)

        @jax.jit
        def chained(zz):
            return jax.lax.fori_loop(0, ITERS, lambda i, c: one_pass(c), zz)

        try:
            t0 = time.perf_counter()
            jax.block_until_ready(chained(jnp.asarray(z0)))
            comp = time.perf_counter() - t0
        except Exception as exc:  # OOM etc: record and continue the sweep
            print(f"tile={tile} B={batch}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:120]}", flush=True)
            continue

        useful = batch * (tile * FACTOR) ** 2 / 1e6
        best = 0.0
        for r in range(3):
            zr = jnp.asarray((z0 + r + 1).astype(np.uint8))
            jax.block_until_ready(zr)
            t0 = time.perf_counter()
            jax.block_until_ready(chained(zr))
            dt = time.perf_counter() - t0
            best = max(best, ITERS * useful / dt)
        print(f"tile={tile} B={batch} side={side}: {best:7.1f} MPix/s "
              f"(compile/warm {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

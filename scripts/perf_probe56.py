"""probe56: EXACT-tier throughput, honest chained protocol.

The default (parity) tier — u8 I/O, f32 HIGHEST-precision im2col dots,
flat merged kernel (_tile_kernel, compute_dtype=None) — was never
honestly benched: bench.py times the fast tier, and the exact tier's
earlier numbers were single-dispatch fiction.  Same carry-derived
protocol as bench.py (every kernel input from the fori_loop carry,
value-fetch sync).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/perf_probe56.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from rusty_sr_tpu.utils.platform import ensure_device_or_respawn
    ensure_device_or_respawn()
    from rusty_sr_tpu import load_builtin
    from rusty_sr_tpu.parallel.tiling import (_tile_kernel, trunk_params,
                                              HALO, _DEFAULT_CHUNK)

    factor, tile = 3, 242
    side = tile + 2 * HALO
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    rng = np.random.default_rng(0)

    def rate(batch, iters=4):
        z = jnp.asarray((rng.random((batch, side, side, 3)) * 255)
                        .astype(np.uint8))

        @jax.jit
        def chained(zz):
            def body(i, c):
                e = jnp.bitwise_xor(c, jnp.uint8(1))
                mm = jnp.bitwise_or(c[:, :, :, :1] >> 7, jnp.uint8(1))
                out = _tile_kernel(params, c, e, mm, factor, tile,
                                   None, True, False)
                return jnp.bitwise_xor(out[:, :side, :side, :], c)
            return jax.lax.fori_loop(0, iters, body, zz)

        int(chained(z)[0, 0, 0, 0])
        mpix = batch * (tile * factor) ** 2 / 1e6
        best = 0.0
        for r in range(3):
            zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
            jax.block_until_ready(zr)
            t0 = time.perf_counter()
            int(chained(zr)[0, 0, 0, 0])
            best = max(best, iters * mpix / (time.perf_counter() - t0))
        return best

    for b in (8, _DEFAULT_CHUNK):
        print(f"EXACT tier B={b:3d}: {rate(b):7.1f} MPix/s", flush=True)


if __name__ == "__main__":
    main()

"""probe54: batch sweep of the packed trunk under the HONEST protocol.

Round-3's bench.py honesty fix (all three kernel inputs — zero tiles,
edge tiles, mask — derived from the loop carry, so nothing is
loop-invariant-hoisted or CSE'd) read 1359 MPix/s at the ladder's
B=112 anchor vs the old protocol's 1504.  The old protocol aliased
edge:=zero (one pack via CSE) and held the mask loop-invariant (its
pack hoisted out of the 20-iter chain) — both packs ARE paid once per
call on the product path (tiled_sr uploads three distinct buffers per
chunk), so the old number overstated product throughput by ~10%.

This sweep re-validates the chunk-ladder optimum under the honest
protocol: the hoisted work scaled with B, so the ladder's relative
shape could have moved.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/perf_probe54.py

RESULTS (v5e, 2026-08-17, best-of-3 rounds, 20-iter chains, value-fetch
sync), MPix/s and ms/pass:

    B=  1             2.53 ms     B= 40            19.47 ms
    B=  2             4.05 ms     B= 48   1143.8   22.12 ms
    B=  4             5.83 ms     B= 56            24.64 ms
    B=  8    634.5    6.65 ms     B= 64   1225.8   27.52 ms
    B= 16    817.7   10.31 ms     B= 80            32.80 ms
    B= 24    926.8   13.65 ms     B= 96   1330.7   38.02 ms
    B= 32            16.83 ms     B=112   1356.3   43.52 ms  <- optimum
                                  B=128    687.0   98.21 ms  (cliff)
                                  B=144   1213.7   62.53 ms

B=112 stays the ladder optimum; the cliff at 116+ and the partial B=144
recovery reproduce under the honest protocol.  _CHUNK_T_MS updated from
this table (was the probe40-42 hoisted-protocol sweep).
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
    from rusty_sr_tpu.parallel.tiling import (_tile_kernel_packed,
                                              packed_trunk_params,
                                              trunk_params, HALO)

    factor, tile = 3, 242
    side = tile + 2 * HALO
    params = packed_trunk_params(trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}))
    rng = np.random.default_rng(0)

    def rate(batch, iters=20):
        z = jnp.asarray((rng.random((batch, side, side, 3)) * 255)
                        .astype(np.uint8))

        @jax.jit
        def chained(zz):
            def body(i, c):
                e = jnp.bitwise_xor(c, jnp.uint8(1))
                mm = jnp.bitwise_or(c[:, :, :, :1] >> 7, jnp.uint8(1))
                out = _tile_kernel_packed(params, c, e, mm, factor, tile,
                                          jnp.bfloat16)
                return jnp.bitwise_xor(out[:, :side, :side, :], c)
            return jax.lax.fori_loop(0, iters, body, zz)

        int(chained(z)[0, 0, 0, 0])  # compile+warm-up, value-fetch sync
        mpix = batch * (tile * factor) ** 2 / 1e6
        best, best_ms = 0.0, float("inf")
        for r in range(3):
            zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
            jax.block_until_ready(zr)
            t0 = time.perf_counter()
            int(chained(zr)[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            best = max(best, iters * mpix / dt)
            best_ms = min(best_ms, dt / iters * 1000)
        return best, best_ms

    for b in (8, 16, 24, 48, 64, 96, 112, 128, 144):
        r, ms = rate(b)
        print(f"B={b:4d}  {r:8.1f} MPix/s  {ms:8.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()

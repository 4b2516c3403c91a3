"""probe55: 2-input packed kernel (zero tiles derived in packed space).

zero-pad == edge-pad * mask bytewise (the gathers differ only outside
the image, where the mask is 0), so `_tile_kernel_packed` can derive
the zero-padded packed tiles as te8 * repeat(m4, 3) instead of packing
a third input buffer — saving the zero-tile pack (a u8 (B,256,256,3)
read + bf16 (B,128,128,12) transpose-cast write), the host-side gather,
and a third of the per-chunk H2D upload.  Bit-identical on CPU (the
mask is {0,1}, u8 codes are exact in bf16 at /256 scaling).

A/B under the round-3 honest protocol (all inputs carry-derived,
probe54): does dropping one pack of the ~5.2 ms pack line show up?

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/perf_probe55.py
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

    def rate(batch, three_input, iters=20):
        z = jnp.asarray((rng.random((batch, side, side, 3)) * 255)
                        .astype(np.uint8))

        @jax.jit
        def chained(zz):
            def body(i, c):
                e = jnp.bitwise_xor(c, jnp.uint8(1))
                mm = jnp.bitwise_or(c[:, :, :, :1] >> 7, jnp.uint8(1))
                zt = c if three_input else None
                out = _tile_kernel_packed(params, zt, e, mm, factor,
                                          tile, jnp.bfloat16)
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

    for b in (24, 96, 112):
        r3 = rate(b, True)
        r2 = rate(b, False)
        print(f"B={b:4d}  3-input {r3:8.1f}  2-input {r2:8.1f} MPix/s  "
              f"({(r2 / r3 - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()

"""Headline benchmark: sustained SR throughput (HR megapixels/sec/chip).

Times the PRODUCT device path — the space-to-depth PACKED trunk kernel
(`_tile_kernel_packed`) with u8 device I/O that `tiled_sr` (and therefore
the CLI) auto-dispatches on the fast tier — at its best measured shape
(tile=242 -> 256-wide lane-aligned padded tiles, batch 112: the chunk the
ladder picks for any large image; scripts/perf_probe36-42).  Throughput
counts only the useful (de-haloed) HR output pixels, so this is the rate
a user's pixels are actually produced at, not a raw-FLOP number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the fraction of the 1 GPix/s-per-chip north-star target
(BASELINE.md; the reference itself publishes no numbers — SURVEY.md §6).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from rusty_sr_tpu.utils.platform import ensure_device_or_respawn
    ensure_device_or_respawn()  # survive transient PJRT-plugin flakes
    from rusty_sr_tpu import load_builtin
    from rusty_sr_tpu.parallel.tiling import (_tile_kernel_packed,
                                              packed_trunk_params,
                                              trunk_params, HALO)

    factor = 3
    # Best measured shape of the PRODUCT packed-trunk kernel — the same
    # executable tiled_sr auto-dispatches on the u8 fast tier; the chunk
    # ladder picks 112 for any large image (scripts/perf_probe36-38;
    # hard HBM cliff at B=116).
    tile, batch = 242, 112
    side = tile + 2 * HALO
    params = packed_trunk_params(trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}))

    rng = np.random.default_rng(0)
    z = jnp.asarray((rng.random((batch, side, side, 3)) * 255)
                    .astype(np.uint8))

    # Throughput mode: bf16 trunk (explicit opt-in; parity mode is f32 and
    # is what the golden tests gate on).
    #
    # The timed loop is a lax.fori_loop *inside* jit with a data dependency
    # between iterations (each iteration consumes the previous output), so
    # the device must execute every pass sequentially — host-side dispatch
    # loops measure only tunnel/dispatch latency on this backend.
    #
    # Honesty constraints (the kernel must pay per-iteration exactly what
    # tiled_sr pays per call — since round 3 the production dispatch is
    # the 2-INPUT form, zero_tiles=None derived on device as edge*mask,
    # probe55): both inputs are derived from the loop CARRY, so nothing
    # can be hoisted out of the loop as loop-invariant and the mask
    # multiplies cannot be constant-folded (the all-ones mask is computed
    # from carry data the compiler cannot see through).
    iters = 20

    @jax.jit
    def chained(zz):
        def body(i, c):
            e = jnp.bitwise_xor(c, jnp.uint8(1))
            mm = jnp.bitwise_or(c[:, :, :, :1] >> 7, jnp.uint8(1))
            out = _tile_kernel_packed(params, None, e, mm, factor, tile,
                                      jnp.bfloat16)
            # fold HR u8 output back into the u8 input for the dependency
            return jnp.bitwise_xor(out[:, :side, :side, :], c)
        return jax.lax.fori_loop(0, iters, body, zz)

    # compile + warm-up, ending in a value fetch: probe53 measured that
    # block_until_ready can return early on a never-fetched executable
    # (scan-shaped cases lied by 100x); a fetch is the trustworthy sync
    # and costs nothing here (probe53 packed B==C).
    int(chained(z)[0, 0, 0, 0])

    useful_hr_mpix = batch * (tile * factor) ** 2 / 1e6
    best = 0.0
    for r in range(3):
        # vary the input per round: repeated identical dispatches can be
        # served from a result cache on this backend
        zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
        jax.block_until_ready(zr)
        t0 = time.perf_counter()
        int(chained(zr)[0, 0, 0, 0])  # value fetch = sync (probe53)
        dt = time.perf_counter() - t0
        best = max(best, iters * useful_hr_mpix / dt)

    print(json.dumps({
        "metric": "sr3x_tiled_throughput",
        "value": round(best, 2),
        "unit": "useful HR megapixels/sec/chip",
        "vs_baseline": round(best / 1000.0, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())

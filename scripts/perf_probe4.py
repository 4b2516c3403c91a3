"""Benchmark the fused Pallas trunk on the real chip vs the XLA path."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.ops.pallas.trunk import fused_trunk, pack_trunk_weights, HALO
from rusty_sr_tpu.models.sr_net import merge_params, sr_apply_fused

BATCH, S, FACTOR, ITERS = 8, 256, 3, 20
HR_MPIX = BATCH * S * S * FACTOR * FACTOR / 1e6
h = HALO


def timed(label, chained, x):
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    comp = time.perf_counter() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{label:34s} {best*1e3:8.2f} ms/pass  {HR_MPIX/best:8.1f} MPix/s "
          f"(compile {comp:.0f}s)", flush=True)


def main():
    params = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
    packed = pack_trunk_weights(params, FACTOR)
    rng = np.random.default_rng(0)
    xpad = jnp.asarray(rng.random((BATCH, S + 2 * h, S + 2 * h, 3),
                                  dtype=np.float32))

    # correctness on-chip: golden parity through the fused engine
    from rusty_sr_tpu.parallel.tiling import tiled_sr
    from rusty_sr_tpu.utils.imageio import load_image, to_u8, psnr
    anime = {k: jnp.asarray(v) for k, v in load_builtin("anime").items()}
    lrimg = load_image("/root/reference/docs/cartoon_lr.png")
    gold = (load_image("/root/reference/docs/cartoon_rsa.png") * 255
            ).round().astype(np.uint8)
    out = tiled_sr(anime, lrimg, 3, tile=50, chunk=8, engine="fused", rh=10,
                   compute_dtype=jnp.bfloat16)
    ours = to_u8(out)
    print(f"fused bf16 golden PSNR: {psnr(ours/255.0, gold/255.0):.2f} dB  "
          f"maxerr {np.abs(ours.astype(int)-gold.astype(int)).max()}",
          flush=True)

    for rh in (8, 16):
        def one(c, rh=rh):
            e = fused_trunk(packed, c, None, FACTOR, rh=rh,
                            compute_dtype=jnp.bfloat16)
            # fold expand back to padded-input shape for the dependency
            r = jnp.pad(e[..., :3] * 1e-6, ((0, 0), (h, h), (h, h), (0, 0)))
            return c + r

        @jax.jit
        def chained(b, one=one):
            return lax.fori_loop(0, ITERS, lambda i, c: one(c), b)

        try:
            timed(f"pallas trunk rh={rh} (no mask)", chained, xpad)
        except Exception as ex:  # noqa: BLE001
            print(f"rh={rh} FAILED: {type(ex).__name__}: {ex}", flush=True)

    # with mask
    mask = jnp.asarray(np.ones((BATCH, S + 2 * h, S + 2 * h, 1), np.float32))

    def one_m(c):
        e = fused_trunk(packed, c, mask, FACTOR, rh=8,
                        compute_dtype=jnp.bfloat16)
        r = jnp.pad(e[..., :3] * 1e-6, ((0, 0), (h, h), (h, h), (0, 0)))
        return c + r

    @jax.jit
    def chained_m(b):
        return lax.fori_loop(0, ITERS, lambda i, c: one_m(c), b)

    try:
        timed("pallas trunk rh=8 (masked)", chained_m, xpad)
    except Exception as ex:  # noqa: BLE001
        print(f"masked FAILED: {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()

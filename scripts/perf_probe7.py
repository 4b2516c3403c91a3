"""Batch/size scaling of the optimized XLA net: find the throughput knee."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import merge_params, sr_apply_fused

FACTOR, ITERS = 3, 20


def timed(label, batch, side):
    params = merge_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    x = jnp.asarray(np.random.default_rng(0).random(
        (batch, side, side, 3), dtype=np.float32))
    hr_mpix = batch * side * side * FACTOR * FACTOR / 1e6

    def one(b):
        out = sr_apply_fused(params, b, FACTOR, compute_dtype=jnp.bfloat16)
        return out[:, :side, :side, :] * 1e-6 + x

    @jax.jit
    def chained(b):
        return lax.fori_loop(0, ITERS, lambda i, c: one(c), b)

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        comp = time.perf_counter() - t0
        best = 1e30
        for r in range(3):
            xr = x * (1.0 + 1e-4 * (r + 1))
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            jax.block_until_ready(chained(xr))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{label:24s} {best*1e3:8.2f} ms  {hr_mpix/best:8.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"{label:24s} FAILED: {str(ex)[:140]}", flush=True)


def main():
    timed("B=8  S=256", 8, 256)
    timed("B=16 S=256", 16, 256)
    timed("B=32 S=256", 32, 256)
    timed("B=4  S=512", 4, 512)
    timed("B=16 S=128", 16, 128)


if __name__ == "__main__":
    main()

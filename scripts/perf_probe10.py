"""Int8 trunk throughput vs bf16 on the chip."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import merge_params, sr_apply_fused
from rusty_sr_tpu.models.quant import quantize_trunk, sr_apply_q8

BATCH, S, FACTOR, ITERS = 16, 256, 3, 20
HR_MPIX = BATCH * S * S * FACTOR * FACTOR / 1e6


def timed(label, fn, x):
    @jax.jit
    def chained(b):
        def body(i, c):
            out = fn(c)
            return (out[:, :S, :S, :3] * 1e-6).astype(c.dtype) + c
        return lax.fori_loop(0, ITERS, body, b)

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
        print(f"{label:28s} {best*1e3:8.2f} ms  {HR_MPIX/best:8.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"{label:28s} FAILED: {str(ex)[:200]}", flush=True)


def main():
    params = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
    m = merge_params(params)
    q = quantize_trunk(m)
    x = jnp.asarray(np.random.default_rng(0).random(
        (BATCH, S, S, 3), dtype=np.float32))
    timed("int8 trunk", lambda b: sr_apply_q8(q, b, FACTOR), x)
    timed("bf16 trunk (ref)", lambda b: sr_apply_fused(
        m, b, FACTOR, compute_dtype=jnp.bfloat16), x)


if __name__ == "__main__":
    main()

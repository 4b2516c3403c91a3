"""XLA-level d2s via stack+free-reshape (no 6-D transpose), full-net test."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import merge_params, sr_apply_fused

BATCH, S, FACTOR, ITERS = 16, 256, 3, 20
HR_MPIX = BATCH * S * S * FACTOR * FACTOR / 1e6


def d2s_stack(x, f):
    n, h, w, cff = x.shape
    c = cff // (f * f)
    planes = [x[..., fy * f * c:(fy + 1) * f * c] for fy in range(f)]
    out5 = jnp.stack(planes, axis=2)          # (n, h, f, w, f*c)
    return out5.reshape(n, h * f, w * f, c)


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
        print(f"{label:34s} {best*1e3:8.2f} ms  {HR_MPIX/best:8.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"{label:34s} FAILED: {str(ex)[:160]}", flush=True)


def main():
    # correctness
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
    t = jnp.asarray(np.random.default_rng(1).random((2, 8, 8, 27),
                                                    dtype=np.float32))
    assert float(jnp.abs(d2s_stack(t, 3) - depth_to_space(t, 3)).max()) == 0.0
    print("d2s_stack correct", flush=True)

    params = merge_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    x3 = jnp.asarray(np.random.default_rng(0).random(
        (BATCH, S, S, 3), dtype=np.float32))

    import rusty_sr_tpu.models.sr_net as m
    orig = m.depth_to_space
    m.depth_to_space = d2s_stack
    try:
        timed("full net + stack d2s",
              lambda b: sr_apply_fused(params, b, FACTOR,
                                       compute_dtype=jnp.bfloat16), x3)
    finally:
        m.depth_to_space = orig
    timed("full net (transpose d2s, ref)",
          lambda b: sr_apply_fused(params, b, FACTOR,
                                   compute_dtype=jnp.bfloat16), x3)


if __name__ == "__main__":
    main()

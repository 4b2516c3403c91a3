"""Pallas d2s vs XLA d2s, and the full net with the Pallas shuffle."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import merge_params
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.pallas.shuffle import depth_to_space_pallas

BATCH, S, FACTOR, ITERS = 16, 256, 3, 20
HR_MPIX = BATCH * S * S * FACTOR * FACTOR / 1e6


def timed(label, fn, x, per_pass_mpix):
    nch = x.shape[-1]

    @jax.jit
    def chained(b):
        def body(i, c):
            out = fn(c)
            sl = out[:, :S, :S, :3]
            if nch > 3:
                sl = jnp.tile(sl, (1, 1, 1, nch // 3))
            return (sl * 1e-6).astype(c.dtype) + c
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
        print(f"{label:34s} {best*1e3:8.2f} ms  {per_pass_mpix/best:8.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        s = str(ex)
        i = s.find("Mosaic")
        print(f"{label:34s} FAILED: {s[i:i+160] if i>=0 else s[:160]}",
              flush=True)


def main():
    rng = np.random.default_rng(0)
    xe = jnp.asarray(rng.random((BATCH, S, S, 27), dtype=np.float32),
                     jnp.bfloat16)
    timed("d2s XLA (bf16 16x256^2x27)",
          lambda b: depth_to_space(b, FACTOR), xe, HR_MPIX)
    for rows in (8, 32):
        timed(f"d2s pallas rows={rows}",
              lambda b, rows=rows: depth_to_space_pallas(b, FACTOR, rows=rows),
              xe, HR_MPIX)

    # full net with pallas d2s
    from rusty_sr_tpu.models.sr_net import sr_apply_fused
    import rusty_sr_tpu.models.sr_net as m
    params = merge_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    x3 = jnp.asarray(rng.random((BATCH, S, S, 3), dtype=np.float32))

    orig = m.depth_to_space
    m.depth_to_space = lambda t, f: depth_to_space_pallas(t, f, rows=8)
    try:
        timed("full net + pallas d2s",
              lambda b: sr_apply_fused(params, b, FACTOR,
                                       compute_dtype=jnp.bfloat16)[..., :27],
              x3, HR_MPIX)
    finally:
        m.depth_to_space = orig


if __name__ == "__main__":
    main()

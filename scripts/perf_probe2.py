"""Component-level timings: which stage eats the time at 320 MPix/s?"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import merge_params
from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import _conv_native
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import upsample_bilinear

BATCH, SIDE, FACTOR, ITERS = 8, 256, 3, 20
HR_MPIX = BATCH * SIDE * SIDE * FACTOR * FACTOR / 1e6
BF = jnp.bfloat16


def timeit(fn, x):
    @jax.jit
    def chained(b):
        def body(i, c):
            out = fn(c)
            # fold back to input shape with a dependency
            return c + out * 1e-6
        return lax.fori_loop(0, ITERS, body, b)

    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    comp = time.perf_counter() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3, comp  # ms per pass


def main():
    params = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
    p = merge_params(params)
    pb = {k: jnp.asarray(v, BF) if getattr(v, 'ndim', 0) == 4 else jnp.asarray(v)
          for k, v in p.items()}
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.random((BATCH, SIDE, SIDE, 3), dtype=np.float32), BF)
    x32 = jnp.asarray(rng.random((BATCH, SIDE, SIDE, 32), dtype=np.float32), BF)
    x27 = jnp.asarray(rng.random((BATCH, SIDE, SIDE, 27), dtype=np.float32), BF)

    def cv(t, name):
        return _conv_native(t, pb[name].astype(BF), BF, None)

    cases = {
        # (fn, input, note)
        "conv0 5x5 3->32": (lambda b: cv(b, "conv0")[..., :3], x3),
        "convA 5x5 32->96": (lambda b: cv(b, "convA")[..., :32], x32),
        "convB 3x3 32->91": (lambda b: cv(b, "convB")[..., :32], x32),
        "conv10 3x3 32->27": (
            lambda b: jnp.pad(cv(b, "conv10"), ((0, 0),) * 3 + ((0, 5),)), x32),
        "belu": (lambda b: belu(b, pb["f_belu"]), x32),
        "bilinear base x3 (bf16)": (
            lambda b: upsample_bilinear(b, FACTOR)[:, :SIDE, :SIDE, :], x3),
        "d2s (bf16)": (
            lambda b: jnp.tile(depth_to_space(b, FACTOR)[:, :SIDE, :SIDE, :],
                               (1, 1, 1, 9)), x27),
    }
    for name, (fn, x) in cases.items():
        ms, comp = timeit(fn, x)
        print(f"{name:28s} {ms:8.3f} ms/pass   (compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

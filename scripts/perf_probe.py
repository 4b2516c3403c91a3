"""Perf probes on the real chip: conv lowering x fusion variants.

Honest timing: in-jit fori_loop with a data dependency between iterations
(host dispatch loops measure only tunnel latency on the axon backend).
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import sr_apply, sr_apply_fused, merge_params
from rusty_sr_tpu.ops.conv import _conv_native, _conv_im2col

BATCH, SIDE, FACTOR, ITERS = 8, 256, 3, 20
HR_MPIX = BATCH * SIDE * SIDE * FACTOR * FACTOR / 1e6


def timeit(apply_fn, params, x):
    def one(b):
        out = apply_fn(params, b)
        return out[:, :SIDE, :SIDE, :] * 1e-6 + x

    @jax.jit
    def chained(b):
        return lax.fori_loop(0, ITERS, lambda i, c: one(c), b)

    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        best = max(best, ITERS * HR_MPIX / (time.perf_counter() - t0))
    return best, compile_s


def main():
    params = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
    mparams = merge_params(params)
    x = jnp.asarray(np.random.default_rng(0).random(
        (BATCH, SIDE, SIDE, 3), dtype=np.float32))

    conv_native = functools.partial(_conv_native, accum=jnp.float32,
                                    precision=None)
    conv_i2c = functools.partial(_conv_im2col, accum=jnp.float32,
                                 precision=None)

    cases = {
        "bf16 baseline (im2col, unmerged)":
            lambda p, b: sr_apply(p, b, FACTOR, compute_dtype=jnp.bfloat16),
        "bf16 merged + im2col":
            lambda p, b: sr_apply_fused(p, b, FACTOR, compute_dtype=jnp.bfloat16,
                                        conv_fn=conv_i2c),
        "bf16 merged + native conv":
            lambda p, b: sr_apply_fused(p, b, FACTOR, compute_dtype=jnp.bfloat16,
                                        conv_fn=conv_native),
        "bf16 unmerged + native conv":
            lambda p, b: sr_apply(p, b, FACTOR, compute_dtype=jnp.bfloat16,
                                  conv_fn=conv_native),
        "f32 parity (im2col HIGHEST)":
            lambda p, b: sr_apply(p, b, FACTOR),
    }
    for name, fn in cases.items():
        use = mparams if "merged" in name else params
        try:
            mpix, comp = timeit(fn, use, x)
            print(f"{name:40s} {mpix:9.1f} MPix/s   (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:40s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

"""Calibrate raw MXU matmul + VPU elementwise throughput at SR shapes."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

ITERS = 20
M = 8 * 256 * 256  # 2.1M pixels


def timeit(fn, x):
    @jax.jit
    def chained(b):
        return lax.fori_loop(0, ITERS, lambda i, c: fn(c), b)
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    comp = time.perf_counter() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3, comp


def dot_case(K, N):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N), dtype=np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32), jnp.bfloat16)

    def fn(c):
        out = jnp.dot(c, w, preferred_element_type=jnp.float32)
        # fold N back to K with a cheap projection to carry the dependency
        return jnp.concatenate([out.astype(jnp.bfloat16)] * (K // N + 1),
                               axis=1)[:, :K]
    ms, comp = timeit(fn, x)
    gflop = 2 * M * K * N / 1e9
    print(f"dot M=2.1M K={K:4d} N={N:4d}: {ms:7.3f} ms  "
          f"{gflop/ms:7.1f} GFLOP/ms ({100*gflop/ms/197:.0f}% peak)  "
          f"(compile {comp:.0f}s)", flush=True)


def main():
    # elementwise bandwidth baseline
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (M, 32)).astype(np.float32), jnp.bfloat16)
    ms, comp = timeit(lambda c: c * 1.0001 + 0.5, x)
    gb = M * 32 * 2 * 2 / 1e9
    print(f"elementwise (M,32) bf16: {ms:.3f} ms  {gb/ms*1e3:.0f} GB/s "
          f"(compile {comp:.0f}s)", flush=True)

    for K, N in [(800, 96), (800, 128), (288, 96), (288, 32), (128, 128),
                 (896, 256)]:
        dot_case(K, N)


if __name__ == "__main__":
    main()

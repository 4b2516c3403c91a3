"""probe26: D2H fetch strategy for the CLI tile output path.

Prior finding (round 2, ad-hoc): on the tunneled v5e, a single
``np.asarray(device_array)`` streams at ~0.2 MB/s (latency-bound internal
chunking over a ~106 ms RTT link) while H2D streams at ~228 MB/s, and a
3-thread parallel fetch hit ~49 MB/s.  The CLI fetch loop
(parallel/tiling.py) fetches chunk results serially, so a 4K upscale
(~224 MB u8 HR) is D2H-bound at minutes.  This probe measures, on
realistic payloads (chunks of B HR u8 tiles, the exact shape the tile
kernel returns):

  1. serial np.asarray per chunk        (current code)
  2. copy_to_host_async all, then fetch (overlap hint)
  3. ThreadPoolExecutor(k) parallel fetch
  4. jax.device_get(list)               (batched API)

Run on the real chip: python scripts/perf_probe26.py
"""
import os
import time
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

B, SIDE = 24, 726  # chunk of HR u8 tiles: 24 x 726 x 726 x 3 = 37.9 MB
N_CHUNKS = 4
MB = B * SIDE * SIDE * 3 / 1e6


@jax.jit
def make(seed):
    k = jax.random.key(seed)
    return jax.random.randint(k, (B, SIDE, SIDE, 3), 0, 256, jnp.uint8)


def fresh():
    xs = [make(i) for i in range(N_CHUNKS)]
    jax.block_until_ready(xs)
    return xs


def t(label, fn):
    xs = fresh()
    t0 = time.perf_counter()
    fn(xs)
    dt = time.perf_counter() - t0
    print(f"{label:34s} {dt:7.2f}s = {N_CHUNKS * MB / dt:7.1f} MB/s",
          flush=True)


def serial(xs):
    for x in xs:
        np.asarray(x)


def async_then_fetch(xs):
    for x in xs:
        x.copy_to_host_async()
    for x in xs:
        np.asarray(x)


def pool(k):
    def run(xs):
        with ThreadPoolExecutor(k) as ex:
            list(ex.map(np.asarray, xs))
    return run


def pool_split(k):
    """Split each chunk along B into k slices fetched in parallel —
    parallelism WITHIN one chunk (what a pipelined fetch loop can use)."""
    def run(xs):
        parts = [x[i * (B // k):(i + 1) * (B // k)] for x in xs
                 for i in range(k)]
        jax.block_until_ready(parts)
        with ThreadPoolExecutor(k) as ex:
            list(ex.map(np.asarray, parts))
    return run


def device_get_all(xs):
    jax.device_get(xs)


if __name__ == "__main__":
    print(f"payload: {N_CHUNKS} chunks x {MB:.1f} MB u8; "
          f"backend {jax.devices()[0].platform}", flush=True)
    # warm the make() executable + one tiny fetch
    np.asarray(make(99)[0, :8, :8])
    t("serial np.asarray", serial)
    t("copy_to_host_async then fetch", async_then_fetch)
    t("ThreadPool(4) whole chunks", pool(4))
    t("ThreadPool(8) whole chunks", pool(8))
    t("jax.device_get(list)", device_get_all)
    t("ThreadPool(8) split-within-chunk", pool_split(8))
    # repeat the winner class once to check stability
    t("serial np.asarray (repeat)", serial)
    t("ThreadPool(8) whole chunks (rep)", pool(8))

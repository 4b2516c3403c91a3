"""probe50: packed-s2d TRAINING trunk vs merged-amp (roadmap #3 tail).

Chained in-jit Adam loops (probe47 protocol).  trunk='packed' runs the
inference fast-tier packing differentiably (4x-channel quarter-res im2col
dots); merged-amp is the current fastest tier (1.54 ms/step @ b4).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rusty_sr_tpu import params as P
from rusty_sr_tpu.train.loop import TrainConfig, loss_fn, make_optimizer

ITERS = 50
MAC_PER_LR_PX = 130_176
PEAK_BF16 = 197e12


def bench(cfg, label, batch, crop=192, rounds=3):
    params = jax.tree.map(jnp.asarray, P.init_params(0, 3))
    opt = make_optimizer(cfg)
    st = opt.init(params)
    pool = jnp.asarray(np.random.default_rng(0).random(
        (4, batch, crop, crop, 3), dtype=np.float32))

    @jax.jit
    def chained(params, st, bump):
        def body(i, c):
            p, s = c
            hr = pool[i % 4] * (1.0 + 1e-6 * (i + bump))
            (l, m), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, hr, cfg)
            updates, s = opt.update(grads, s, p)
            return (optax.apply_updates(p, updates), s)
        return jax.lax.fori_loop(0, ITERS, body, (params, st))

    t0 = time.perf_counter()
    out = jax.block_until_ready(chained(params, st, 0))
    comp = time.perf_counter() - t0
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        out = jax.block_until_ready(chained(out[0], out[1], r + 1))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    flops = 3 * 2 * MAC_PER_LR_PX * batch * (crop // 3) ** 2
    print(f"{label:12s} batch {batch:3d}: {best * 1e3:8.3f} ms/step  "
          f"{batch / best:8.1f} samples/s  "
          f"MFU {100 * flops / best / PEAK_BF16:5.2f}%  "
          f"(compile {comp:.0f}s)", flush=True)


def main():
    for batch in (4, 32):
        bench(TrainConfig(batch_size=batch, crop=192, amp=True),
              "merged-amp", batch)
        bench(TrainConfig(batch_size=batch, crop=192, trunk="packed"),
              "packed", batch)


if __name__ == "__main__":
    main()

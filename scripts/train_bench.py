"""Training-step throughput on the chip (reference protocol: batch 4,
192^2 HR crops).  Host-stepped with varied batches — the end-to-end rate
the training loop actually achieves (async dispatch pipelines steps)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import params as P
from rusty_sr_tpu.train.loop import TrainConfig, make_train_step

ITERS = 30


def main():
    cfg = TrainConfig()
    params = jax.tree.map(jnp.asarray, P.init_params(0, cfg.factor))
    step_fn, opt = make_train_step(cfg)
    st = opt.init(params)
    hr0 = np.random.default_rng(0).random(
        (cfg.batch_size, cfg.crop, cfg.crop, 3), dtype=np.float32)

    t0 = time.perf_counter()
    params, st, loss, mse = step_fn(params, st, jnp.asarray(hr0))
    jax.block_until_ready(params)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for i in range(ITERS):
        hr = jnp.asarray(hr0 * (1 + 1e-5 * i))  # varied: avoid result cache
        params, st, loss, mse = step_fn(params, st, hr)
    jax.block_until_ready(params)
    dt = (time.perf_counter() - t0) / ITERS
    sps = 1.0 / dt
    print(f"train step: {dt*1e3:.2f} ms  ({sps:.1f} steps/s, "
          f"{sps*cfg.batch_size:.1f} samples/s; reference budget 10M samples "
          f"=> {10e6/(sps*cfg.batch_size)/3600:.2f} h)", flush=True)


if __name__ == "__main__":
    main()

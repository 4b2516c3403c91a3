"""Training-step throughput scaling on the chip (VERDICT round-1 item 8).

Sweeps batch size and rematerialisation at the reference's 192^2 HR crops
(protocol: src/main.rs:187,199-205).  Host-stepped with varied batches —
the end-to-end rate the training loop actually achieves (async dispatch
pipelines steps; params/opt-state buffers are donated).

Prints a table plus one bench-style JSON line for the reference protocol
point (batch 4).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import params as P
from rusty_sr_tpu.train.loop import TrainConfig, make_train_step

ITERS = 30


def bench(batch: int, remat: bool, crop: int = 192) -> float:
    cfg = TrainConfig(batch_size=batch, crop=crop, remat=remat)
    params = jax.tree.map(jnp.asarray, P.init_params(0, cfg.factor))
    step_fn, opt = make_train_step(cfg)
    st = opt.init(params)
    hr0 = np.random.default_rng(0).random(
        (batch, crop, crop, 3), dtype=np.float32)

    t0 = time.perf_counter()
    params, st, loss, mse = step_fn(params, st, jnp.asarray(hr0))
    jax.block_until_ready(params)
    comp = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(ITERS):
        hr = jnp.asarray(hr0 * (1 + 1e-5 * i))  # varied: avoid result cache
        params, st, loss, mse = step_fn(params, st, hr)
    jax.block_until_ready(params)
    dt = (time.perf_counter() - t0) / ITERS
    sps = batch / dt
    print(f"batch {batch:3d} remat={int(remat)}: {dt * 1e3:7.2f} ms/step  "
          f"{sps:8.1f} samples/s  (compile {comp:.0f}s)", flush=True)
    return sps


def main():
    results = {}
    for remat in (False, True):
        for batch in (4, 8, 16, 32):
            results[(batch, remat)] = bench(batch, remat)

    ref = results[(4, False)]
    print(f"\nreference budget 10M samples at batch 4: "
          f"{10e6 / ref / 3600:.2f} h")
    print(json.dumps({
        "metric": "train_throughput_b4_192crop",
        "value": round(ref, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()

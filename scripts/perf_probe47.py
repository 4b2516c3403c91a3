"""probe47: HONEST train-step timing — merged vs flat trunk (VERDICT r2
#1 follow-up).

train_bench.py host-steps with per-step H2D uploads over the tunnel;
at this model's size a step is ~0.1-0.5 ms of real compute, so those
numbers are dispatch noise (MFU ~2%, and merged/flat ordering flips
between batch sizes).  Here the whole optimisation loop is chained
INSIDE one jit (lax.fori_loop over the train step, input varied per
iteration from a device-resident pool), which is also exactly how a
TPU-resident training loop would run production steps.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import params as P
from rusty_sr_tpu.train.loop import TrainConfig, loss_fn, make_optimizer

ITERS = 50
MAC_PER_LR_PX = 130_176
PEAK_BF16 = 197e12


def bench(batch, trunk, crop=192, amp=False, rounds=3):
    cfg = TrainConfig(batch_size=batch, crop=crop, trunk=trunk, amp=amp)
    params = jax.tree.map(jnp.asarray, P.init_params(0, cfg.factor))
    opt = make_optimizer(cfg)
    st = opt.init(params)
    pool = jnp.asarray(np.random.default_rng(0).random(
        (4, batch, crop, crop, 3), dtype=np.float32))

    def step(carry, i):
        params, st = carry
        hr = pool[i % 4] * (1.0 + 1e-6 * i)   # varied input each iter
        (loss, mse), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, hr, cfg)
        import optax
        updates, st = opt.update(grads, st, params)
        params = optax.apply_updates(params, updates)
        return (params, st), loss

    @jax.jit
    def chained(params, st, bump):
        def body(i, c):
            (p, s), _ = step(c, i + bump)
            return (p, s)
        return jax.lax.fori_loop(0, ITERS, body, (params, st))

    t0 = time.perf_counter()
    out = jax.block_until_ready(chained(params, st, 0))
    comp = time.perf_counter() - t0
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        out = jax.block_until_ready(chained(out[0], out[1], r + 1))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    flops = 3 * 2 * MAC_PER_LR_PX * batch * (crop // cfg.factor) ** 2
    print(f"batch {batch:3d} trunk={trunk:6s} amp={int(amp)}: "
          f"{best * 1e3:7.3f} ms/step  {batch / best:8.1f} samples/s  "
          f"MFU {100 * flops / best / PEAK_BF16:5.2f}%  "
          f"(compile {comp:.0f}s)", flush=True)
    return batch / best


def main():
    for trunk in ("merged", "flat"):
        for batch in (4, 32, 128):
            bench(batch, trunk)
    bench(32, "merged", amp=True)


if __name__ == "__main__":
    main()

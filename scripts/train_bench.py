"""Training-step throughput on the chip (reference protocol: batch 4,
192^2 HR crops).  In-jit chained steps carry (params, opt_state) so every
step really executes on device."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import optax

from rusty_sr_tpu import params as P
from rusty_sr_tpu.train.loop import TrainConfig, loss_fn, make_optimizer

ITERS = 10


def main():
    cfg = TrainConfig()
    params = jax.tree.map(jnp.asarray, P.init_params(0, cfg.factor))
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    hr = jnp.asarray(np.random.default_rng(0).random(
        (cfg.batch_size, cfg.crop, cfg.crop, 3), dtype=np.float32))

    @jax.jit
    def run(params, opt_state, hr):
        def body(i, carry):
            p, s = carry
            (loss, mse), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, hr, cfg)
            upd, s = opt.update(grads, s, p)
            return (optax.apply_updates(p, upd), s)
        return lax.fori_loop(0, ITERS, body, (params, opt_state))

    t0 = time.perf_counter()
    out = run(params, opt_state, hr)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(params, opt_state, hr))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    sps = 1.0 / best
    print(f"train step: {best*1e3:.2f} ms  ({sps:.1f} steps/s, "
          f"{sps*cfg.batch_size:.1f} samples/s; reference budget 10M samples "
          f"=> {10e6/(sps*cfg.batch_size)/3600:.1f} h)", flush=True)


if __name__ == "__main__":
    main()

"""probe62: the training crop-shape curve (VERDICT r4 #4).

Training MFU is shape-bound at the reference's 192-px HR crop (64x64 LR
x 32 channels leaves the MXU starved).  Now that --crop is a product
knob, measure what larger crops buy: crops {192, 256, 320, 384} x
{merged-amp, packed} at the production batch 32, plus a remat arm at the
largest crop (the HBM trade --remat exists for).  Same chained in-jit
Adam protocol as probe50/58, probe53 value-fetch sync.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 \
     python scripts/perf_probe62_crop_curve.py
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

ITERS = 30
MAC_PER_LR_PX = 130_176
PEAK_BF16 = 197e12


def bench(cfg, label, rounds=3):
    batch, crop = cfg.batch_size, cfg.crop
    params = jax.tree.map(jnp.asarray, P.init_params(0, 3))
    opt = make_optimizer(cfg)
    st = opt.init(params)
    pool = jnp.asarray(np.random.default_rng(0).random(
        (4, batch, crop, crop, 3), dtype=np.float32))

    @jax.jit
    def chained(params, st, pool, bump):
        def body(i, c):
            p, s = c
            hr = pool[i % 4] * (1.0 + 1e-6 * (i + bump))
            (l, m), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, hr, cfg)
            updates, s = opt.update(grads, s, p)
            return (optax.apply_updates(p, updates), s)
        return jax.lax.fori_loop(0, ITERS, body, (params, st))

    try:
        t0 = time.perf_counter()
        out = chained(params, st, pool, 0)
        float(out[0]["conv0"][0, 0, 0, 0])      # value-fetch sync (probe53)
        comp = time.perf_counter() - t0
    except Exception as e:   # OOM arms are data, not crashes
        print(f"{label:18s} crop {crop:3d}: FAILED ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)
        return
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        out = chained(out[0], out[1], pool, r + 1)
        float(out[0]["conv0"][0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    flops = 3 * 2 * MAC_PER_LR_PX * batch * (crop // 3) ** 2
    px = batch * (crop // 3) ** 2 / 1e6
    print(f"{label:18s} crop {crop:3d}: {best * 1e3:8.3f} ms/step  "
          f"{batch / best:7.1f} samples/s  {px / best:7.1f} LR MPix/s  "
          f"MFU(bf16pk) {100 * flops / best / PEAK_BF16:5.2f}%  "
          f"(compile {comp:.0f}s)", flush=True)


def main():
    for crop in (192, 258, 324, 384):
        # crop must divide by 3 and give an even LR side for packed
        # (258 -> LR 86, 324 -> 108, 384 -> 128)
        bench(TrainConfig(batch_size=32, crop=crop, trunk="packed"),
              "packed")
        bench(TrainConfig(batch_size=32, crop=crop, amp=True),
              "merged-amp")
    bench(TrainConfig(batch_size=32, crop=384, trunk="packed", remat=True),
          "packed+remat")


if __name__ == "__main__":
    from rusty_sr_tpu.utils.platform import ensure_device_or_respawn
    ensure_device_or_respawn()
    main()

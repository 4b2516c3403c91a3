"""probe58: training-step scaling past the reference protocol (b128/256).

probe47/50 measured the tiers at b4/b32 (+ f32/flat at b128); the
production-training question — how far do `--amp` and `--trunk packed`
scale when the batch actually feeds the MXU — was open.  Same chained
in-jit Adam protocol as probe50, armored with the probe53 value-fetch
sync (block_until_ready alone can return early on some chain shapes).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/perf_probe58.py
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


def bench(cfg, label, batch, crop=192, rounds=3):
    params = jax.tree.map(jnp.asarray, P.init_params(0, 3))
    opt = make_optimizer(cfg)
    st = opt.init(params)
    # pool is a jit ARGUMENT (not a closure): a closed-over (4,B,192,192,3)
    # f32 would be baked into the executable as a ~450 MB constant at
    # batch 256, inflating compile/load and HBM (ADVICE r3).
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

    t0 = time.perf_counter()
    out = chained(params, st, pool, 0)
    float(out[0]["conv0"][0, 0, 0, 0])          # value-fetch sync (probe53)
    comp = time.perf_counter() - t0
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        out = chained(out[0], out[1], pool, r + 1)
        float(out[0]["conv0"][0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    flops = 3 * 2 * MAC_PER_LR_PX * batch * (crop // 3) ** 2
    # MFU is against the bf16 MXU peak for EVERY arm (incl. merged-f32,
    # which runs multi-pass over the same units) — a cross-arm
    # utilisation yardstick, not a per-dtype roofline.
    print(f"{label:12s} batch {batch:3d}: {best * 1e3:8.3f} ms/step  "
          f"{batch / best:8.1f} samples/s  "
          f"MFU(bf16pk) {100 * flops / best / PEAK_BF16:5.2f}%  "
          f"(compile {comp:.0f}s)", flush=True)


def main():
    for batch in (128, 256):
        bench(TrainConfig(batch_size=batch, crop=192, amp=True),
              "merged-amp", batch)
        bench(TrainConfig(batch_size=batch, crop=192, trunk="packed"),
              "packed", batch)
    # f32 control at b128 ties this run's scale to probe47's 49.8 ms.
    bench(TrainConfig(batch_size=128, crop=192), "merged-f32", 128)


if __name__ == "__main__":
    from rusty_sr_tpu.utils.platform import ensure_device_or_respawn
    ensure_device_or_respawn()
    main()

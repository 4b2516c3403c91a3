"""Training-step throughput scaling on the chip (VERDICT r1 #8, r2 #1).

Sweeps batch size, trunk form (merged convA/B/C — the round-3 default —
vs the flat 9-conv reference topology) and rematerialisation at the
reference's 192^2 HR crops (protocol: src/main.rs:187,199-205).

Protocol: ITERS steps chained inside ONE dispatch via
make_train_step_multi (lax.scan of the step body — the same device-
resident pattern the product train_loop uses via steps_per_dispatch),
with the batch stack varied every timed round.  Host-stepped timing at
this model's size measures dispatch, not compute (CLAUDE.md; the
round-2 numbers it produced are retracted in PERF.md) — never time that
way here.

Prints a table (with a training-MFU column: fwd+bwd ~= 3x forward FLOPs,
130,176 MAC/LR px, vs the chip's 197 TFLOP/s bf16 peak) plus one
bench-style JSON line for the reference protocol point (batch 4,
merged).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import params as P
from rusty_sr_tpu.train.loop import TrainConfig, make_train_step_multi

ITERS = 30        # steps chained per dispatch
ROUNDS = 3        # timed rounds, inputs varied per round; best-of

MAC_PER_LR_PX = 130_176          # SURVEY.md §6 (conv shapes)
PEAK_BF16 = 197e12               # v5e bf16 peak, PERF.md convention


def bench(batch: int, remat: bool, crop: int = 192,
          trunk: str = "merged", amp: bool = False) -> float:
    cfg = TrainConfig(batch_size=batch, crop=crop, remat=remat,
                      trunk=trunk, amp=amp)
    params = jax.tree.map(jnp.asarray, P.init_params(0, cfg.factor))
    step_fn, opt = make_train_step_multi(cfg, ITERS)
    st = opt.init(params)
    rng = np.random.default_rng(0)

    def stack(r):
        # fresh batches each round: this backend can serve repeated
        # identical dispatches from a result cache (CLAUDE.md rules)
        return jnp.asarray(rng.random(
            (ITERS, batch, crop, crop, 3), dtype=np.float32))

    hrs = jax.block_until_ready(stack(0))
    t0 = time.perf_counter()
    params, st, loss, mse = step_fn(params, st, hrs)
    # probe53: on this backend block_until_ready on a lax.scan
    # executable's outputs can return WITHOUT waiting until the
    # executable has had one value fetched ("0.04 ms/step", MFU 700% —
    # fiction).  The armor: fetch a value from the warmup result, and
    # end every timed region with a scalar fetch (measured zero-cost).
    float(loss)
    comp = time.perf_counter() - t0

    best = float("inf")
    for r in range(ROUNDS):
        hrs = jax.block_until_ready(stack(r + 1))
        t0 = time.perf_counter()
        params, st, loss, mse = step_fn(params, st, hrs)
        float(loss)  # value fetch = the only trustworthy sync (probe53)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    dt = best
    sps = batch / dt
    # fwd + input-grad + weight-grad ~= 3x forward FLOPs
    flops = 3 * 2 * MAC_PER_LR_PX * batch * (crop // cfg.factor) ** 2
    mfu = flops / dt / PEAK_BF16
    print(f"batch {batch:3d} trunk={trunk:6s} remat={int(remat)} "
          f"amp={int(amp)}: {dt * 1e3:7.2f} ms/step  {sps:8.1f} samples/s  "
          f"MFU {100 * mfu:5.2f}%  (compile {comp:.0f}s)", flush=True)
    return sps


def main():
    results = {}
    for trunk in ("merged", "flat"):
        for batch in (4, 8, 16, 32):
            results[(batch, trunk)] = bench(batch, False, trunk=trunk)
    for batch in (4, 32):
        results[(batch, "merged-remat")] = bench(batch, True)
    for batch in (4, 32):   # does the bf16-backward emitter still lose?
        results[(batch, "merged-amp")] = bench(batch, False, amp=True)

    ref = results[(4, "merged")]
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

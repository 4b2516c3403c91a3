"""probe49: PRODUCT train_loop end-to-end rate — steps_per_dispatch and
the amp/precision tiers, through the actual shipped loop.

Measurement note (itself a finding): a fresh jit wrapper on this
tunneled backend costs ~15-50 s even on a compilation-cache HIT (the
executable must be loaded to the remote device), so timing a whole
train_loop call over a few hundred steps measures executable loading,
not training (first attempt read 79 ms/step for a 2.2 ms step).  A real
run amortises that once over 2.5 M steps.  Here the rate is taken
INSIDE one train_loop call, between metrics-cadence boundaries.
"""

import json
import os
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from rusty_sr_tpu.train.loop import TrainConfig, train_loop

STEPS = 500


def bench(spd, batch=4, amp=False, precision="highest"):
    cfg = TrainConfig(batch_size=batch, crop=192, steps_per_dispatch=spd,
                      amp=amp, precision=precision, checkpoint_every=100)
    rng = np.random.default_rng(0)
    pool = [rng.random((batch, 192, 192, 3), dtype=np.float32)
            for _ in range(8)]

    def batches(n):
        for i in range(n):
            yield pool[i % 8]

    with tempfile.NamedTemporaryFile("r", suffix=".jsonl") as mf:
        train_loop(cfg, batches(STEPS), max_steps=STEPS,
                   metrics_file=mf.name, log=lambda s: None)
        recs = [json.loads(l) for l in open(mf.name)]
    w = {r["step"]: r["wall_s"] for r in recs}
    dt = (w[STEPS] - w[100]) / (STEPS - 100)
    print(f"spd={spd:3d} batch={batch} amp={int(amp)} prec={precision}: "
          f"{dt * 1e3:7.3f} ms/step  {batch / dt:8.1f} samples/s  "
          f"(steady-state, steps 100-{STEPS})", flush=True)


def main():
    bench(1)
    bench(10)
    bench(10, amp=True)
    bench(10, precision="high")
    bench(10, batch=32)
    bench(10, batch=32, amp=True)


if __name__ == "__main__":
    main()

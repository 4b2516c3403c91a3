"""Per-op device profile of the merged SR net using jax.profiler xspace.

Prints the top TPU ops by self time — the ground truth for where the
10 ms trunk pass actually goes.
"""

import glob
import os
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import merge_params, sr_apply_fused

BATCH, S, FACTOR, ITERS = 16, 256, 3, 20


def main():
    params = merge_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    x = jnp.asarray(np.random.default_rng(0).random(
        (BATCH, S, S, 3), dtype=np.float32))

    def one(b):
        out = sr_apply_fused(params, b, FACTOR, compute_dtype=jnp.bfloat16)
        return out[:, :S, :S, :] * 1e-6 + x

    @jax.jit
    def chained(b):
        return lax.fori_loop(0, ITERS, lambda i, c: one(c), b)

    jax.block_until_ready(chained(x))  # compile

    log_dir = "/tmp/sr_trace"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    jax.block_until_ready(chained(x))
    jax.profiler.stop_trace()

    files = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read())
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        tot = defaultdict(float)
        for line in plane.lines:
            for ev in line.events:
                tot[ev.name] += ev.duration_ns / 1e6
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{ms:10.2f} ms  {name[:140]}")


if __name__ == "__main__":
    main()

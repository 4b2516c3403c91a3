"""Probe 19: batch refinement at tile=242 with convA native.

probe18: b16 452, b24 483, b32 393 — non-monotonic; pin down the peak.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rusty_sr_tpu import load_builtin  # noqa: E402
from rusty_sr_tpu.parallel.tiling import trunk_params  # noqa: E402
from perf_probe18 import bench  # noqa: E402


def main():
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    for batch in (20, 24, 28):
        mp = bench(242, batch, ("convA",), params)
        print(f"NA t242 b{batch}: {mp:7.1f} useful MPix/s", flush=True)


if __name__ == "__main__":
    main()

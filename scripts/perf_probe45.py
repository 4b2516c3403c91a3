"""probe45: HBM high-water of the int8 tier vs the bf16 packed tier
(VERDICT r2 #8: the int8 tier claims "low memory" — measure it or demote
the tier).

Runs ONE tier per process (peak_bytes_in_use is a high-water mark you
cannot reset): `python perf_probe45.py bf16|bf16_112|int8|exact`.
Each mode gathers B tiles at tile=242, runs the tier's kernel once,
blocks, then prints the device memory stats.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import (HALO, _tile_kernel,
                                          _tile_kernel_packed,
                                          _tile_kernel_q8,
                                          packed_trunk_params, trunk_params)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    tile = 242
    side = tile + 2 * HALO
    B = 112 if mode.endswith("112") else 24
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})

    rng = np.random.default_rng(0)
    z = jnp.asarray((rng.random((B, side, side, 3)) * 255)
                    .astype(np.uint8))
    e = z
    m = jnp.asarray(np.ones((B, side, side, 1), np.uint8))

    if mode.startswith("bf16"):
        pp = packed_trunk_params(params, jnp.bfloat16, 3)
        out = _tile_kernel_packed(pp, z, e, m, 3, tile, jnp.bfloat16)
    elif mode == "int8":
        from rusty_sr_tpu.models.quant import (calibrate_act_scales,
                                               quantize_trunk)
        sample = np.asarray(z[:4]).astype(np.float32) / 255.0
        q = quantize_trunk(params, calibrate_act_scales(params, sample))
        out = _tile_kernel_q8(q, z, e, m, 3, tile, True)
    elif mode == "exact":
        out = _tile_kernel(params, z, e, m, 3, tile, None, True, False)
    else:
        raise SystemExit(f"unknown mode {mode}")
    jax.block_until_ready(out)

    dev = jax.devices()[0]
    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    print(f"mode={mode} B={B}: peak_bytes_in_use="
          f"{peak / 1e9 if peak else None} GB; "
          f"bytes_in_use={stats.get('bytes_in_use', 0) / 1e9:.3f} GB; "
          f"largest_alloc={stats.get('largest_alloc_size', 0) / 1e9:.3f} GB",
          flush=True)


if __name__ == "__main__":
    main()

"""probe45b: HBM high-water by filler-buffer bisection (VERDICT r2 #8).

The axon backend exposes no device memory_stats (probe45: all fields
None/0), so peak usage is measured the hard way: pre-allocate a filler
buffer of G GB, run the tier's kernel at B tiles, and find the largest
filler that still executes.  peak ~= HBM_TOTAL - max_filler.

Usage: python perf_probe45b.py MODE GB   (one attempt per process —
allocator state is not reliably resettable after an OOM)
MODE: bf16 | int8 | exact   at B=24, tile=242.
Prints OK or OOM.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import (HALO, _tile_kernel,
                                          _tile_kernel_packed,
                                          _tile_kernel_q8,
                                          packed_trunk_params, trunk_params)


def main():
    mode, gb = sys.argv[1], float(sys.argv[2])
    tile = 242
    side = tile + 2 * HALO
    B = 112 if mode.endswith("_112") else 24
    mode = mode.replace("_112", "")
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    filler = jax.device_put(np.zeros(int(gb * 1e9 // 4), np.float32))
    jax.block_until_ready(filler)

    rng = np.random.default_rng(0)
    z = jnp.asarray((rng.random((B, side, side, 3)) * 255)
                    .astype(np.uint8))
    e = z
    m = jnp.asarray(np.ones((B, side, side, 1), np.uint8))
    try:
        if mode == "bf16":
            pp = packed_trunk_params(params, jnp.bfloat16, 3)
            out = _tile_kernel_packed(pp, z, e, m, 3, tile, jnp.bfloat16)
        elif mode == "int8":
            from rusty_sr_tpu.models.quant import (calibrate_act_scales,
                                                   quantize_trunk)
            # sample size == product calibration path (chunk tiles) so
            # the calibration forward reuses the cached executable
            sample = np.asarray(z).astype(np.float32) / 255.0
            q = quantize_trunk(params,
                               calibrate_act_scales(params, sample))
            out = _tile_kernel_q8(q, z, e, m, 3, tile, True)
        else:
            out = _tile_kernel(params, z, e, m, 3, tile, None, True, False)
        jax.block_until_ready(out)
        print(f"mode={mode} filler={gb}GB B={B}: OK", flush=True)
    except Exception as ex:  # noqa: BLE001 — OOM class varies
        print(f"mode={mode} filler={gb}GB B={B}: OOM ({type(ex).__name__})",
              flush=True)


if __name__ == "__main__":
    main()

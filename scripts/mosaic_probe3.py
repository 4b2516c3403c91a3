"""Time one conv stage in K-major form vs round-1 lane-offset stores.

Stage-A-like block: rows=32, cols=128, Cin=32, 25 offsets (K=800), N=96.
Grid iterates many blocks to get steady-state per-block cost.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS, CIN, COUT, KH = 16, 128, 32, 96, 5
K = KH * KH * CIN
NBLK = 128  # blocks per pass
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((NBLK, ROWS + KH - 1, COLS + KH - 1, CIN)),
                jnp.bfloat16)
w = jnp.asarray(rng.random((K, COUT)), jnp.bfloat16)

GFLOP = 2 * NBLK * ROWS * COLS * K * COUT / 1e9


def kernel_kmajor(x_ref, w_ref, o_ref, pat_ref):
    for dy in range(KH):
        for dx in range(KH):
            g = dy * KH + dx
            pat_ref[g * CIN:(g + 1) * CIN, :, :] = jnp.transpose(
                x_ref[dy:dy + ROWS, dx:dx + COLS, :], (2, 0, 1))
    pat = pat_ref[...].reshape(K, ROWS * COLS)
    o_ref[...] = lax.dot_general(
        pat, w_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def kernel_lane_stores(x_ref, w_ref, o_ref, pat_ref):
    for dy in range(KH):
        for dx in range(KH):
            g = dy * KH + dx
            pat_ref[:, :, g * CIN:(g + 1) * CIN] = \
                x_ref[dy:dy + ROWS, dx:dx + COLS, :]
    pat = pat_ref[...].reshape(ROWS * COLS, K)
    o_ref[...] = jnp.dot(pat, w_ref[...],
                         preferred_element_type=jnp.float32)


def timed(name, kernel, scratch_shape, out_shape):
    fn = pl.pallas_call(
        kernel,
        grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((None, ROWS + KH - 1, COLS + KH - 1, CIN),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None,) + out_shape, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NBLK,) + out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.bfloat16)],
    )

    @jax.jit
    def loop(xx):
        return fn(xx, w)

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x))
        comp = time.perf_counter() - t0
        best = 1e30
        for r in range(4):
            xr = x * (1.0 + 1e-3 * r)
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(xr))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:24s} {best*1e3:8.2f} ms  {GFLOP/best:7.1f} GFLOP/s "
              f"({100*GFLOP/best/197000:.0f}% peak)  (compile {comp:.0f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        s = str(e)
        i = s.find("Mosaic")
        print(f"{name}: FAIL {s[i:i+160] if i>=0 else s[:160]}", flush=True)


def main():
    timed("K-major + lhsT dot", kernel_kmajor, (K, ROWS, COLS),
          (ROWS * COLS, COUT))
    timed("lane-offset stores", kernel_lane_stores, (ROWS, COLS, K),
          (ROWS * COLS, COUT))


if __name__ == "__main__":
    main()

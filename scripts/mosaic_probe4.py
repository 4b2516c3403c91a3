"""Probe 4: conv stage as 25 SHIFTED DOTS — no patch materialisation.

Round-1/2 dead ends (mosaic_probe2/3): building im2col patches in VMEM
scratch is ~40x too slow regardless of layout — per-offset stores are the
wall.  This probe keeps the input flat in VMEM as ((rh+4)*Wp, Cin) and
feeds each (dy,dx) offset STRAIGHT into an MXU dot as a statically-offset
row slice (off = dy*Wp+dx), accumulating 25 small-K dots in f32 registers:

    acc += dot(xf[off : off+rh*Wp, :32], W[dy,dx])    # (M,32)@(32,96)

No scratch, no stores, garbage columns (the Wp-W pad lanes) are computed
and cropped on the way out.  HBM per stage drops from write+read of a
25x-replicated patch tensor to one read of x + one write of y.  Open
questions this probe answers:
  1. does Mosaic lower misaligned 2nd-minor row slices into the dot
     without a relayout copy?           (variant 'slice')
  2. is pltpu.roll on the sublane axis a viable alternative shift engine?
     (variant 'roll')
  3. what fraction of MXU peak do K=32 dots reach at these shapes?
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

ROWS, COLS, CIN, COUT, KH = 16, 256, 32, 96, 5
PAD = KH - 1
WP = COLS + PAD
MID = ROWS * WP            # dot M per block
NBLK = 64
rng = np.random.default_rng(0)
# flat padded blocks: ((ROWS+4)*WP + 4, CIN) — the +PAD tail keeps the
# largest offset slice (off = PAD*WP+PAD) in bounds
XROWS = (ROWS + PAD) * WP + PAD
x = jnp.asarray(rng.random((NBLK, XROWS, CIN)), jnp.bfloat16)
w = jnp.asarray(rng.random((KH * KH, CIN, COUT)) - 0.5, jnp.bfloat16)

GFLOP = 2 * NBLK * ROWS * COLS * (KH * KH * CIN) * COUT / 1e9


def kernel_slice(x_ref, w_ref, o_ref):
    xf = x_ref[0]
    acc = jnp.zeros((MID, COUT), jnp.float32)
    for dy in range(KH):
        for dx in range(KH):
            off = dy * WP + dx
            acc += jnp.dot(xf[off:off + MID, :], w_ref[dy * KH + dx],
                           preferred_element_type=jnp.float32)
    o_ref[0] = acc


def kernel_roll(x_ref, w_ref, o_ref):
    xf = x_ref[0]
    acc = jnp.zeros((MID, COUT), jnp.float32)
    for dy in range(KH):
        for dx in range(KH):
            off = dy * WP + dx
            sh = pltpu.roll(xf, XROWS - off, axis=0)
            acc += jnp.dot(sh[:MID, :], w_ref[dy * KH + dx],
                           preferred_element_type=jnp.float32)
    o_ref[0] = acc


def run(name, kernel):
    fn = pl.pallas_call(
        kernel,
        grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((1, XROWS, CIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, MID, COUT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NBLK, MID, COUT), jnp.float32),
    )

    @jax.jit
    def loop(xx):
        return fn(xx, w)

    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(x))
        comp = time.perf_counter() - t0
        best = 1e30
        for r in range(4):
            xr = x * (1.0 + 1e-3 * r)
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(xr))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:10s}: {GFLOP / best:8.1f} GFLOP/s "
              f"({best * 1e3:7.2f} ms, compile {comp:.0f}s)", flush=True)
        return np.asarray(out)
    except Exception as e:
        print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def xla_reference():
    """Same math via the XLA im2col dot (the current production path)."""
    def f(xx):
        pats = [lax.dynamic_slice(xx, (0, dy * WP + dx, 0),
                                  (NBLK, MID, CIN))
                for dy in range(KH) for dx in range(KH)]
        pat = jnp.concatenate(pats, axis=-1)
        return lax.dot_general(
            pat, w.reshape(KH * KH * CIN, COUT),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    loop = jax.jit(f)
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(x))
    comp = time.perf_counter() - t0
    best = 1e30
    for r in range(4):
        xr = x * (1.0 + 1e-3 * r)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(xr))
        best = min(best, time.perf_counter() - t0)
    print(f"{'xla':10s}: {GFLOP / best:8.1f} GFLOP/s "
          f"({best * 1e3:7.2f} ms, compile {comp:.0f}s)", flush=True)
    return np.asarray(out)


def main():
    ref = xla_reference()
    for name, k in (("slice", kernel_slice), ("roll", kernel_roll)):
        out = run(name, k)
        if out is not None and ref is not None:
            err = np.abs(out - ref).max()
            print(f"           max err vs xla: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()

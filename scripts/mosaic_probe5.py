"""Probe 5: ALIGNED shifted-dot conv, timed with CHAINED in-jit iterations.

Two fixes over mosaic_probe4:

1. **Timing**: probe4 timed single host dispatches; on this tunneled
   backend those sit on a ~30 ms round-trip floor, so every variant
   (including the "xla" baseline) reported the same floor — the
   "slice == XLA" verdict compared dispatch latency, not kernels.  Here
   each measurement chains ITERS kernel invocations inside one jit with a
   one-element data dependency between iterations (the bench.py rule).
2. **Alignment**: probe4's WP=260 made EVERY row offset sublane-
   misaligned.  Here WP=272 (multiple of the bf16 sublane tile 16) makes
   the dy*WP offsets free; the dx in-row shifts are hoisted into KH
   one-time shifted copies in VMEM scratch (KH relayouts per block
   instead of KH*KH per-dot relayouts).

Variants (3x3, CIN=32, COUT=96 — the convB stage shape, NBLK=64 blocks of
16x256 LR px ≈ the B=24 tile pass):
  xla-prod : production im2col form on (B,H,W,C) image layout (what the
             tile kernel runs today) — the bar to beat.
  aligned  : dy*WP-only slices (wrong math — dx ignored): pure upper
             bound for aligned-slice-fed K=32 MXU dots.
  copy3    : KH shifted copies (32-lane scratch), KH*KH aligned K=32 dots.
  pack3    : 96-lane scratch packing the KH dx-shifts side by side,
             KH aligned K=96 dots (fewer, K-fatter MXU issues).
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

ROWS, COLS, CIN, COUT, KH = 16, 256, 32, 96, 3
PAD = KH - 1
WP = 272                    # COLS + PAD rounded up to a multiple of 16
MID = ROWS * WP             # dot M per block
NBLK = 64
SROWS = (ROWS + PAD) * WP   # rows each shifted copy must cover
XROWS = SROWS + PAD         # +PAD tail keeps the largest dx slice in bounds
ITERS = 10
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((NBLK, XROWS, CIN)), jnp.bfloat16)
w = jnp.asarray(rng.random((KH * KH, CIN, COUT)) - 0.5, jnp.bfloat16)

# count only useful output columns (COLS of WP)
GFLOP = 2 * NBLK * ROWS * COLS * (KH * KH * CIN) * COUT / 1e9


def kernel_aligned(x_ref, w_ref, o_ref):
    xf = x_ref[0]
    acc = jnp.zeros((MID, COUT), jnp.float32)
    for dy in range(KH):
        for dx in range(KH):
            off = dy * WP               # dx dropped: aligned upper bound
            acc += jnp.dot(xf[off:off + MID, :], w_ref[dy * KH + dx],
                           preferred_element_type=jnp.float32)
    o_ref[0] = acc


def kernel_copy3(x_ref, w_ref, o_ref, s_ref):
    xf = x_ref[0]
    for dx in range(KH):                # KH one-time shifted copies
        s_ref[dx] = xf[dx:dx + SROWS, :]
    acc = jnp.zeros((MID, COUT), jnp.float32)
    for dy in range(KH):
        for dx in range(KH):
            off = dy * WP               # aligned: WP % 16 == 0
            acc += jnp.dot(s_ref[dx, off:off + MID, :], w_ref[dy * KH + dx],
                           preferred_element_type=jnp.float32)
    o_ref[0] = acc


def kernel_pack3(x_ref, wp_ref, o_ref, s_ref):
    xf = x_ref[0]
    for dx in range(KH):                # pack dx shifts into lane groups
        s_ref[:, dx * CIN:(dx + 1) * CIN] = xf[dx:dx + SROWS, :]
    acc = jnp.zeros((MID, COUT), jnp.float32)
    for dy in range(KH):
        off = dy * WP
        acc += jnp.dot(s_ref[off:off + MID, :], wp_ref[dy],
                       preferred_element_type=jnp.float32)
    o_ref[0] = acc


def chain_and_time(name, one, xx0, gflop):
    """Time ITERS chained invocations of one(x)->out inside a single jit.

    The next iteration's input depends on the previous output through a
    one-element update, so the device must run every pass; per-iteration
    overhead is one 20 MB copy-with-update of x (~0.04 ms), identical
    across variants.
    """
    def body(i, carry):
        xx, s = carry
        out = one(xx)
        d = jnp.max(out[0, 0, :])       # real dependency, tiny read
        xx = xx.at[0, 0, 0].add(d.astype(xx.dtype) * jnp.asarray(1e-6, xx.dtype))
        return xx, s + d

    @jax.jit
    def loop(xx):
        return lax.fori_loop(0, ITERS, body, (xx, jnp.float32(0.0)))

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(loop(xx0))
        comp = time.perf_counter() - t0
        best = 1e30
        for r in range(4):
            xr = xx0 * (1.0 + 1e-3 * r)
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(xr))
            best = min(best, time.perf_counter() - t0)
        per = best / ITERS
        print(f"{name:10s}: {gflop / per:8.1f} GFLOP/s "
              f"({per * 1e3:7.2f} ms/iter, compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def make_pallas(kernel, scratch=None, wq=None):
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
        scratch_shapes=[] if scratch is None else [scratch],
    )
    ww = w if wq is None else wq
    return lambda xx: fn(xx, ww)


def check(name, one):
    """Single-dispatch correctness check vs numpy (timing-independent)."""
    out = np.asarray(jax.jit(one)(x))
    xn = np.asarray(x, np.float32)
    wn = np.asarray(w, np.float32)
    ref = np.zeros((NBLK, MID, COUT), np.float32)
    for dy in range(KH):
        for dx in range(KH):
            off = dy * WP + dx
            ref += xn[:, off:off + MID, :] @ wn[dy * KH + dx]
    err = np.abs(out - ref).max()
    rel = err / max(np.abs(ref).max(), 1e-9)
    print(f"           {name} max err vs ref: {err:.3e} (rel {rel:.1e})",
          flush=True)


def xla_production_form():
    B, H, W = 24, 256, 256
    xi = jnp.asarray(rng.random((B, H + PAD, W + PAD, CIN)), jnp.bfloat16)
    wf = w.reshape(KH * KH * CIN, COUT)

    def one(xx):
        pats = [lax.dynamic_slice(xx, (0, dy, dx, 0), (B, H, W, CIN))
                for dy in range(KH) for dx in range(KH)]
        pat = jnp.concatenate(pats, axis=-1)
        return jnp.dot(pat, wf, preferred_element_type=jnp.float32)

    gf = 2 * B * H * W * (KH * KH * CIN) * COUT / 1e9
    chain_and_time("xla-prod", one, xi, gf)


def main():
    print(f"shape: {KH}x{KH} conv, CIN={CIN} COUT={COUT}, WP={WP} "
          f"(aligned), NBLK={NBLK}, chained x{ITERS}", flush=True)
    xla_production_form()
    chain_and_time("aligned", make_pallas(kernel_aligned), x, GFLOP)
    wq_pack = jnp.concatenate([w[dy * KH:(dy + 1) * KH]
                               .reshape(KH * CIN, COUT)[None]
                               for dy in range(KH)])
    variants = [
        ("copy3", make_pallas(kernel_copy3,
                              pltpu.VMEM((KH, SROWS, CIN), jnp.bfloat16))),
        ("pack3", make_pallas(kernel_pack3,
                              pltpu.VMEM((SROWS, KH * CIN), jnp.bfloat16),
                              wq_pack)),
    ]
    for name, one in variants:
        try:
            check(name, one)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        chain_and_time(name, one, x, GFLOP)


if __name__ == "__main__":
    main()

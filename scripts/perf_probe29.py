"""Probe 29: quality/throughput frontier of the out16 stage-rounding knob.

Re-running the tier-quality harness AFTER adopting out16 + native 3x3
stages (the 592 MPix/s config) showed the fast tier at +0.0584 dB mean GT
delta — OVER the 0.05 dB north-star budget (it was +0.0382 before out16,
at 537 MPix/s).  The bf16 rounding of convA's output (the widest stage
tensor, feeding every later sum) is the suspect.  Variants:

  all : out16=True    (product as of b5d2179; 592 MPix/s)
  bcd : out16="bcd"   (convA output stays f32; 3x3 outputs bf16 — keeps
                       the native-3x3 lowering win, pays f32 HBM for `a`)
  off : out16=False   (round-1 fast tier; 537 MPix/s)

For each: mean GT delta over the 4 docs HR images (self-supervised
protocol, product tiled_sr path) + chained B=24 throughput.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import make_lr_from_hr
from rusty_sr_tpu.parallel.tiling import (trunk_params, HALO, _tile_kernel,
                                          tiled_sr)
from rusty_sr_tpu.utils.imageio import load_image, psnr

F, TILE = 3, 242
H = HALO
SIDE = TILE + 2 * H
CD = jnp.bfloat16
ITERS = 10
DOCS = "/root/reference/docs"
HR_IMAGES = ["cartoon_rsa.png", "butterfly_rs.png", "bank_rs.png",
             "logo_rs.png"]

params = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
tparams = trunk_params(params)
rng = np.random.default_rng(0)

VARIANTS = [("all", True), ("bcd", "bcd"), ("off", False)]


def gt_deltas():
    print("== GT delta (self-supervised, product path) ==", flush=True)
    deltas = {n: [] for n, _ in VARIANTS}
    for name in HR_IMAGES:
        hr = load_image(f"{DOCS}/{name}")
        h, w, _ = hr.shape
        hr = hr[: h - h % 3, : w - w % 3]
        lr = np.asarray(make_lr_from_hr(jnp.asarray(hr)[None], 3)[0])
        base = psnr(np.clip(tiled_sr(params, lr, 3, tile=TILE), 0, 1), hr)
        row = f"{name:18s} exact {base:6.2f} dB"
        for n, o in VARIANTS:
            out = np.clip(tiled_sr(params, lr, 3, tile=TILE,
                                   compute_dtype=CD, out16=o), 0, 1)
            d = base - psnr(out, hr)
            deltas[n].append(d)
            row += f"  {n} Δ{d:+.4f}"
        print(row, flush=True)
    for n, _ in VARIANTS:
        md = float(np.mean(deltas[n]))
        print(f"mean GT delta {n}: {md:+.4f} dB "
              f"({'PASS' if md <= 0.05 else 'over budget'})", flush=True)


def time_variant(name, o16, nb=24):
    z8 = jnp.asarray((rng.random((nb, SIDE, SIDE, 3)) * 255)
                     .astype(np.uint8))
    m = jnp.asarray(np.ones((nb, SIDE, SIDE, 1), np.uint8))

    def one(zz):
        return _tile_kernel(tparams, zz, zz, m, F, TILE, CD, True, o16)

    def body(i, carry):
        xx, s = carry
        out = one(xx)
        d = jnp.max(out)
        xx = xx.at[(0,) * xx.ndim].add(d.astype(xx.dtype))
        return xx, s + d.astype(jnp.float32)

    @jax.jit
    def loop(xx):
        return lax.fori_loop(0, ITERS, body, (xx, jnp.float32(0.0)))

    t0 = time.perf_counter()
    jax.block_until_ready(loop(z8))
    comp = time.perf_counter() - t0
    best = 1e30
    for r in range(3):
        xr = jnp.asarray((np.asarray(z8) + r + 1).astype(np.uint8))
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(xr))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    mpix = nb * (TILE * F) ** 2 / 1e6 / per
    print(f"{name:4s}: {per * 1e3:7.2f} ms/pass  {mpix:6.1f} MPix/s "
          f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    gt_deltas()
    print("== chained throughput (B=24) ==", flush=True)
    for n, o in VARIANTS:
        time_variant(n, o)

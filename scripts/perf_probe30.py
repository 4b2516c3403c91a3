"""Probe 30: isolate the fast-tier quality regression to s2d conv0.

Probe 29 showed ALL out16 variants over the 0.05 dB budget (+0.058),
while the 19:56 pre-s2d run measured +0.038 — and probe21/22's own
adoption checks show s2d conv0 was never bit-identical to the direct
bf16 path (max 2 u8 codes, ~7e-4 of pixels) but was only ever compared
against the bf16 anchor, not the exact tier.  A/B at identical tile:

  s2d  : product (conv0_s2d=True,  out16=True, native 3x3)
  dir  : conv0_s2d=False (direct u8-exact conv0), all else equal

For each: fidelity vs exact + GT delta + chained B=24 throughput.
Decision rule: if `dir` returns to the ~+0.04 class, the default flips
to the fastest budget-compliant config.
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
from rusty_sr_tpu.utils.imageio import load_image, psnr, to_u8

F, TILE = 3, 242
H = HALO
SIDE = TILE + 2 * H
CD = jnp.bfloat16
ITERS = 10
DOCS = "/root/reference/docs"
LR_INPUTS = ["cartoon_lr.png", "butterfly_lr.png", "bank_lr.png"]
HR_IMAGES = ["cartoon_rsa.png", "butterfly_rs.png", "bank_rs.png",
             "logo_rs.png"]

params = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
tparams = trunk_params(params)
rng = np.random.default_rng(0)

VARIANTS = [("s2d", True), ("dir", False)]


def quality():
    print("== fidelity vs exact ==", flush=True)
    fid = {n: [] for n, _ in VARIANTS}
    for name in LR_INPUTS:
        lr = load_image(f"{DOCS}/{name}")
        exact = to_u8(np.clip(tiled_sr(params, lr, 3, tile=TILE), 0, 1)) / 255.0
        row = f"{name:18s}"
        for n, s2d in VARIANTS:
            out = to_u8(np.clip(tiled_sr(params, lr, 3, tile=TILE,
                                         compute_dtype=CD,
                                         conv0_s2d=s2d), 0, 1)) / 255.0
            db = psnr(out, exact)
            fid[n].append(db)
            row += f"  {n} {db:6.2f} dB"
        print(row, flush=True)
    for n, _ in VARIANTS:
        print(f"mean fidelity {n}: {np.mean(fid[n]):.2f} dB", flush=True)

    print("== GT delta ==", flush=True)
    deltas = {n: [] for n, _ in VARIANTS}
    for name in HR_IMAGES:
        hr = load_image(f"{DOCS}/{name}")
        h, w, _ = hr.shape
        hr = hr[: h - h % 3, : w - w % 3]
        lr = np.asarray(make_lr_from_hr(jnp.asarray(hr)[None], 3)[0])
        base = psnr(np.clip(tiled_sr(params, lr, 3, tile=TILE), 0, 1), hr)
        row = f"{name:18s} exact {base:6.2f} dB"
        for n, s2d in VARIANTS:
            out = np.clip(tiled_sr(params, lr, 3, tile=TILE,
                                   compute_dtype=CD, conv0_s2d=s2d), 0, 1)
            d = base - psnr(out, hr)
            deltas[n].append(d)
            row += f"  {n} Δ{d:+.4f}"
        print(row, flush=True)
    for n, _ in VARIANTS:
        md = float(np.mean(deltas[n]))
        print(f"mean GT delta {n}: {md:+.4f} dB "
              f"({'PASS' if md <= 0.05 else 'over budget'})", flush=True)


def time_variant(name, s2d, nb=24):
    z8 = jnp.asarray((rng.random((nb, SIDE, SIDE, 3)) * 255)
                     .astype(np.uint8))
    m = jnp.asarray(np.ones((nb, SIDE, SIDE, 1), np.uint8))

    def one(zz):
        return _tile_kernel(tparams, zz, zz, m, F, TILE, CD, True, True, s2d)

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
    quality()
    print("== chained throughput (B=24, out16=True) ==", flush=True)
    for n, s2d in VARIANTS:
        time_variant(n, s2d)

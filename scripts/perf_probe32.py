"""Probe 32: conv0 weight-split — restore the quality budget at speed.

Root cause of the fast-tier budget regression (probes 29-31, worktree
archaeology): the validated +0.038 dB run (d134efe) ran conv0 at
Precision.HIGH (f32-class WEIGHTS); e17a7eb's u8-exact bf16 conv0 made
the *input* exact but dropped the weights to one bf16 rounding —
+0.02 dB GT, over the 0.05 budget.  Fix under test: two-term weight
split (w = hi + lo, both bf16) as a single K=216 dot over duplicated
input channels — Precision.HIGH-class conv0 accuracy, MXU-native.

  ws-off : current product (single bf16 weights)    ~598 MPix/s
  ws-on  : weight-split conv0 (fix)

For each: fidelity vs exact + GT delta + chained B=24 throughput.
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

VARIANTS = [("ws-off", False), ("ws-on", True)]


def quality():
    print("== fidelity vs exact ==", flush=True)
    fid = {n: [] for n, _ in VARIANTS}
    for name in LR_INPUTS:
        lr = load_image(f"{DOCS}/{name}")
        exact = to_u8(np.clip(tiled_sr(params, lr, 3, tile=TILE), 0, 1)) / 255.0
        row = f"{name:18s}"
        for n, ws in VARIANTS:
            out = to_u8(np.clip(tiled_sr(params, lr, 3, tile=TILE,
                                         compute_dtype=CD,
                                         conv0_ws=ws), 0, 1)) / 255.0
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
        for n, ws in VARIANTS:
            out = np.clip(tiled_sr(params, lr, 3, tile=TILE,
                                   compute_dtype=CD, conv0_ws=ws), 0, 1)
            d = base - psnr(out, hr)
            deltas[n].append(d)
            row += f"  {n} Δ{d:+.4f}"
        print(row, flush=True)
    for n, _ in VARIANTS:
        md = float(np.mean(deltas[n]))
        print(f"mean GT delta {n}: {md:+.4f} dB "
              f"({'PASS' if md <= 0.05 else 'over budget'})", flush=True)


def time_variant(name, ws, nb=24):
    z8 = jnp.asarray((rng.random((nb, SIDE, SIDE, 3)) * 255)
                     .astype(np.uint8))
    m = jnp.asarray(np.ones((nb, SIDE, SIDE, 1), np.uint8))

    def one(zz):
        return _tile_kernel(tparams, zz, zz, m, F, TILE, CD, True, True,
                            True, ws)

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
    print(f"{name:6s}: {per * 1e3:7.2f} ms/pass  {mpix:6.1f} MPix/s "
          f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    quality()
    print("== chained throughput (B=24, out16=True, s2d) ==", flush=True)
    for n, ws in VARIANTS:
        time_variant(n, ws)

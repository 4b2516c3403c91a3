"""Probe 37: packed-trunk quality gate + batch sweep.

Validates the productized packed trunk (tiling._tile_kernel_packed,
auto-dispatched by tiled_sr on the u8 fast tier) against the exact tier:
u8-protocol GT delta + fidelity, packed vs flat; then a B sweep at the
new per-pass time (the 24 optimum was tuned at 21 ms/pass; at ~16 ms the
fixed overheads weigh differently).
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
from rusty_sr_tpu.parallel.tiling import (trunk_params, packed_trunk_params,
                                          HALO, _tile_kernel_packed, tiled_sr)
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
rng = np.random.default_rng(0)
VARIANTS = [("flat", "flat"), ("packed", "auto")]


def quality():
    print("== fidelity vs exact (u8 inputs) ==", flush=True)
    fid = {n: [] for n, _ in VARIANTS}
    for name in LR_INPUTS:
        lr8 = to_u8(np.clip(load_image(f"{DOCS}/{name}"), 0, 1))
        exact = tiled_sr(params, lr8, 3, tile=TILE) / 255.0
        row = f"{name:18s}"
        for n, tr in VARIANTS:
            out = tiled_sr(params, lr8, 3, tile=TILE, compute_dtype=CD,
                           trunk=tr) / 255.0
            db = psnr(out, exact)
            fid[n].append(db)
            row += f"  {n} {db:6.2f} dB"
        print(row, flush=True)
    for n, _ in VARIANTS:
        print(f"mean fidelity {n}: {np.mean(fid[n]):.2f} dB", flush=True)

    print("== GT delta (u8 protocol) ==", flush=True)
    deltas = {n: [] for n, _ in VARIANTS}
    for name in HR_IMAGES:
        hr = load_image(f"{DOCS}/{name}")
        h, w, _ = hr.shape
        hr = hr[: h - h % 3, : w - w % 3]
        lr = to_u8(np.clip(np.asarray(
            make_lr_from_hr(jnp.asarray(hr)[None], 3)[0]), 0, 1))
        base = psnr(tiled_sr(params, lr, 3, tile=TILE) / 255.0, hr)
        row = f"{name:18s} exact {base:6.2f} dB"
        for n, tr in VARIANTS:
            out = tiled_sr(params, lr, 3, tile=TILE, compute_dtype=CD,
                           trunk=tr) / 255.0
            d = base - psnr(out, hr)
            deltas[n].append(d)
            row += f"  {n} Δ{d:+.4f}"
        print(row, flush=True)
    for n, _ in VARIANTS:
        md = float(np.mean(deltas[n]))
        print(f"mean GT delta {n}: {md:+.4f} dB "
              f"({'PASS' if md <= 0.05 else 'over budget'})", flush=True)


def time_b(nb):
    pp = packed_trunk_params(trunk_params(params), CD)
    z8 = jnp.asarray((rng.random((nb, SIDE, SIDE, 3)) * 255)
                     .astype(np.uint8))
    m = jnp.asarray(np.ones((nb, SIDE, SIDE, 1), np.uint8))

    def one(zz):
        return _tile_kernel_packed(pp, zz, zz, m, F, TILE, CD)

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
    print(f"B={nb:2d}: {per * 1e3:7.2f} ms/pass  {mpix:6.1f} MPix/s "
          f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    quality()
    print("== packed B sweep ==", flush=True)
    for nb in (24, 16, 20, 28, 32, 48):
        time_b(nb)

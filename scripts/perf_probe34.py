"""Probe 34: masked bf16 split — final quality/throughput validation.

The two-term conv0 splits (round-1 "+1.7 dB" input split AND probe32's
weight split) were being silently FOLDED TO ZERO inside jit: XLA's
allow-excess-precision simplification rewrites upcast(downcast(v)) -> v,
so `v - v.astype(bf16).astype(f32)` becomes v - v == 0 (measured
mean|lo| == 0 in-net; lax.optimization_barrier does not prevent it).
The fix is a bit-masked split (ops.conv.bf16_split) with no convert pair
to elide; in-net conv0 then matches Precision.HIGH to 4e-8 mean.

Measured here through the product path, ws = masked split on/off:
u8 + f32 GT protocols, fidelity, and chained B=24 throughput.
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
from rusty_sr_tpu.parallel.tiling import trunk_params, HALO, _tile_kernel, tiled_sr
from rusty_sr_tpu.utils.imageio import load_image, psnr, to_u8

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
VARIANTS = [("ws-off", False), ("ws-on", True)]


def gt_mode(mode):
    print(f"== GT delta ({mode} lr) ==", flush=True)
    deltas = {n: [] for n, _ in VARIANTS}
    for name in HR_IMAGES:
        hr = load_image(f"{DOCS}/{name}")
        h, w, _ = hr.shape
        hr = hr[: h - h % 3, : w - w % 3]
        lr = np.asarray(make_lr_from_hr(jnp.asarray(hr)[None], 3)[0])
        if mode == "u8":
            lr = to_u8(np.clip(lr, 0, 1))
        scale = 255.0 if mode == "u8" else 1.0
        base = psnr(np.clip(tiled_sr(params, lr, 3, tile=TILE)
                            .astype(np.float32) / scale, 0, 1), hr)
        row = f"{name:18s} exact {base:6.2f} dB"
        for n, ws in VARIANTS:
            out = np.clip(tiled_sr(params, lr, 3, tile=TILE,
                                   compute_dtype=CD, conv0_ws=ws)
                          .astype(np.float32) / scale, 0, 1)
            d = base - psnr(out, hr)
            deltas[n].append(d)
            row += f"  {n} Δ{d:+.4f}"
        print(row, flush=True)
    for n, _ in VARIANTS:
        md = float(np.mean(deltas[n]))
        print(f"mean GT delta {n} ({mode}): {md:+.4f} dB "
              f"({'PASS' if md <= 0.05 else 'over budget'})", flush=True)


def time_variant(name, ws, nb=24):
    z8 = jnp.asarray((rng.random((nb, SIDE, SIDE, 3)) * 255).astype(np.uint8))
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
    gt_mode("u8")
    gt_mode("f32")
    print("== chained throughput (B=24, u8, out16) ==", flush=True)
    for n, ws in VARIANTS:
        time_variant(n, ws)

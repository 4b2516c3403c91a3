"""Probe 33: conv0 weight-split, measured on the branches it changes.

Probe 32's quality section silently measured only the f32-INPUT conv0
branch (the harness feeds float LR images; the u8 s2d/dir branches —
the CLI product path — never ran).  Here both input modes are measured,
ws on/off each:

  f32 lr : the reference validation protocol (in-graph pair synthesis)
  u8  lr : the PRODUCT path (PNG u8 in, u8 device I/O) — exact and fast
           tiers fed the SAME u8-quantised lr so the input quantisation
           cancels in the delta

plus fidelity vs exact per mode.  Decision: ws default stays on iff it
restores the f32-mode mean GT delta to <= 0.05 (probe 32 already showed
ws is throughput-FREE: 597.9 vs 591.0 MPix/s).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import make_lr_from_hr
from rusty_sr_tpu.parallel.tiling import tiled_sr
from rusty_sr_tpu.utils.imageio import load_image, psnr, to_u8

TILE = 242
CD = jnp.bfloat16
DOCS = "/root/reference/docs"
HR_IMAGES = ["cartoon_rsa.png", "butterfly_rs.png", "bank_rs.png",
             "logo_rs.png"]

params = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
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
            lr = to_u8(np.clip(lr, 0, 1))  # uint8 array -> u8 device path
        base = psnr(np.clip(
            tiled_sr(params, lr, 3, tile=TILE).astype(np.float32)
            / (255.0 if mode == "u8" else 1.0), 0, 1), hr)
        row = f"{name:18s} exact {base:6.2f} dB"
        for n, ws in VARIANTS:
            out = np.clip(
                tiled_sr(params, lr, 3, tile=TILE, compute_dtype=CD,
                         conv0_ws=ws).astype(np.float32)
                / (255.0 if mode == "u8" else 1.0), 0, 1)
            d = base - psnr(out, hr)
            deltas[n].append(d)
            row += f"  {n} Δ{d:+.4f}"
        print(row, flush=True)
    for n, _ in VARIANTS:
        md = float(np.mean(deltas[n]))
        print(f"mean GT delta {n} ({mode}): {md:+.4f} dB "
              f"({'PASS' if md <= 0.05 else 'over budget'})", flush=True)


if __name__ == "__main__":
    gt_mode("u8")
    gt_mode("f32")

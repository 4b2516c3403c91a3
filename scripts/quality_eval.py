"""Tier-quality harness: mean PSNR delta of fast/int8 vs the exact tier.

Substantiates the north-star quality budget (BASELINE.md: <= 0.05 dB PSNR
delta) for the throughput tiers, through the PRODUCT path (tiled_sr), over
a multi-image set (the reference's docs/ images as a Set14 stand-in —
nothing else ships offline).

Two measurements per tier:
- fidelity:  PSNR(tier output, exact output) per LR input — how close the
  tier is to the exact path in output space;
- GT delta:  PSNR(exact, HR) - PSNR(tier, HR) on self-supervised pairs
  (HR -> factor-pool -> LR -> SR), the reference's own validation protocol
  (src/main.rs:231-250) — how much real quality the tier costs.

Usage: python scripts/quality_eval.py [--platform cpu] [--weights imagenet]
"""

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

DOCS = "/root/reference/docs"
LR_INPUTS = ["cartoon_lr.png", "butterfly_lr.png", "bank_lr.png"]
HR_IMAGES = ["cartoon_rsa.png", "butterfly_rs.png", "bank_rs.png",
             "logo_rs.png"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--weights", default="imagenet")
    ap.add_argument("--tile", type=int, default=242)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    from rusty_sr_tpu import load_builtin
    from rusty_sr_tpu.parallel.tiling import tiled_sr
    from rusty_sr_tpu.models.sr_net import make_lr_from_hr
    from rusty_sr_tpu.utils.imageio import load_image, to_u8, psnr

    params = {k: jnp.asarray(v) for k, v in load_builtin(args.weights).items()}
    tiers = {
        "fast": dict(compute_dtype=jnp.bfloat16, engine="xla"),
        "int8": dict(compute_dtype=None, engine="int8"),
    }

    def run(img, **kw):
        return np.clip(tiled_sr(params, img, 3, tile=args.tile, **kw), 0, 1)

    print(f"== tier fidelity vs exact (u8-quantised outputs, {args.weights}) ==")
    fid = {t: [] for t in tiers}
    for name in LR_INPUTS:
        lr = load_image(f"{DOCS}/{name}")
        exact = to_u8(run(lr)) / 255.0
        row = f"{name:18s}"
        for t, kw in tiers.items():
            db = psnr(to_u8(run(lr, **kw)) / 255.0, exact)
            fid[t].append(db)
            row += f"  {t} {db:6.2f} dB"
        print(row)
    for t in tiers:
        print(f"mean fidelity {t}: {np.mean(fid[t]):.2f} dB")

    # Two GT protocols.  "u8" is the PRODUCT protocol: the LR input is a
    # u8 image (what the CLI decodes from PNG — the reference's own I/O,
    # src/main.rs:170) and outputs are u8; this is the protocol the
    # north-star budget is judged on.  "f32" feeds the unquantised
    # synthesized LR and compares unquantised outputs — a stricter
    # magnifier of tier error (no shared quantisation floor), reported
    # for engineering honesty.
    for mode in ("u8", "f32"):
        print(f"== GT delta on self-supervised pairs ({mode} protocol) ==")
        deltas = {t: [] for t in tiers}
        for name in HR_IMAGES:
            hr = load_image(f"{DOCS}/{name}")
            h, w, _ = hr.shape
            hr = hr[: h - h % 3, : w - w % 3]
            lr = np.asarray(make_lr_from_hr(jnp.asarray(hr)[None], 3)[0])
            if mode == "u8":
                lr = to_u8(np.clip(lr, 0, 1))
            scale = 255.0 if mode == "u8" else 1.0

            def gt_run(**kw):
                out = tiled_sr(params, lr, 3, tile=args.tile, **kw)
                return np.clip(out.astype(np.float32) / scale, 0, 1)

            base = psnr(gt_run(), hr)
            row = f"{name:18s} exact {base:6.2f} dB"
            for t, kw in tiers.items():
                d = base - psnr(gt_run(**kw), hr)
                deltas[t].append(d)
                row += f"  {t} Δ{d:+.4f}"
            print(row)
        for t in tiers:
            md = float(np.mean(deltas[t]))
            verdict = "PASS" if md <= 0.05 else "over budget"
            print(f"mean GT delta {t} ({mode}): {md:+.4f} dB  "
                  f"(north-star budget 0.05 dB: {verdict})")


if __name__ == "__main__":
    main()

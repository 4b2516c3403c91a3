"""End-to-end demo of the rusty_sr_tpu Python API.

Run:  python examples/demo.py [outdir]
Uses the reference's sample images (read-only) as inputs.
"""

import sys
import os

import numpy as np

import rusty_sr_tpu
from rusty_sr_tpu.utils.imageio import load_image, save_image, psnr

DOCS = "/root/reference/docs"


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rusty_sr_demo"
    os.makedirs(outdir, exist_ok=True)

    # 1. Upscale 3x with the anime weights (bit-exact class vs reference)
    lr = load_image(f"{DOCS}/cartoon_lr.png")
    hr = rusty_sr_tpu.upscale(lr, weights="anime")
    save_image(f"{outdir}/cartoon_3x.png", hr)
    gold = load_image(f"{DOCS}/cartoon_rsa.png")
    print(f"anime 3x: {hr.shape}  parity {psnr(np.clip(hr,0,1), gold):.1f} dB "
          f"vs reference output")

    # 2. Fast mode (bf16 trunk) for throughput
    hr_fast = rusty_sr_tpu.upscale(lr, weights="anime", fast=True)
    save_image(f"{outdir}/cartoon_3x_fast.png", hr_fast)
    print(f"fast mode delta vs exact: "
          f"{np.abs(hr_fast - hr).max() * 255:.1f} u8 codes max")

    # 3. Gamma-correct downscale + bilinear compare
    big = load_image(f"{DOCS}/butterfly_rs.png")
    small = rusty_sr_tpu.downscale(big)
    net = rusty_sr_tpu.upscale(small, weights="imagenet")
    bil = rusty_sr_tpu.upscale_bilinear(small)
    crop = big[: net.shape[0], : net.shape[1]]
    print(f"butterfly self-SR: net {psnr(np.clip(net,0,1), crop):.2f} dB, "
          f"bilinear {psnr(np.clip(bil,0,1), crop):.2f} dB")

    # 4. Train briefly on the sample images (smoke, CPU-friendly)
    folder = outdir + "/train_imgs"
    os.makedirs(folder, exist_ok=True)
    save_image(f"{folder}/a.png", big)
    params = rusty_sr_tpu.train_folder(folder, steps=2,
                                       param_file=f"{outdir}/demo.rsr")
    print(f"trained checkpoint: {outdir}/demo.rsr "
          f"({os.path.getsize(outdir + '/demo.rsr')} bytes, "
          f"byte-compatible with the reference)")


if __name__ == "__main__":
    main()

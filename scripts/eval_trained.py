"""Evaluate a trained .rsr on the docs protocol (VERDICT r4 #1 'Done').

For each docs image: derive the LR input with the in-graph pair
synthesis (srgb->linear -> 3x3 mean-pool -> linear->srgb, the same
protocol training optimises), then score PSNR vs the HR source for
  - the trained weights (exact tier),
  - the shipped imagenet weights (the reference's own artifact),
  - the bilinear baseline.
logo_rs was HELD OUT of the round-5 training folder; the other three
images (augmented) formed the training set — in-domain vs held-out is
reported per image.

Run: python scripts/eval_trained.py runs/r5_long/model.rsr [--platform cpu]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

if "--platform" in sys.argv:
    import jax
    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])

import jax.numpy as jnp  # noqa: E402

from rusty_sr_tpu import load_builtin, params as P  # noqa: E402
from rusty_sr_tpu.api import upscale_bilinear  # noqa: E402
from rusty_sr_tpu.models.sr_net import make_lr_from_hr  # noqa: E402
from rusty_sr_tpu.parallel.tiling import tiled_sr  # noqa: E402
from rusty_sr_tpu.utils.imageio import load_image, psnr, to_u8  # noqa: E402

DOCS = "/root/reference/docs/"
IMAGES = {  # HR source -> in training set?
    "bank_rs.png": True,
    "butterfly_rs.png": True,
    "cartoon_rsa.png": True,
    "logo_rs.png": False,
}


def main():
    rsr = sys.argv[1]
    trained = {k: jnp.asarray(v) for k, v in P.load_rsr_file(rsr, 3).items()}
    imagenet = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
    rows = []
    for name, in_train in IMAGES.items():
        hr = load_image(DOCS + name)
        h, w, _ = hr.shape
        hr = hr[: h - h % 3, : w - w % 3]
        lr = to_u8(np.clip(np.asarray(
            make_lr_from_hr(jnp.asarray(hr)[None], 3)[0]), 0, 1))
        outs = {
            "trained": tiled_sr(trained, lr, 3, tile=242, chunk=4) / 255.0,
            "imagenet": tiled_sr(imagenet, lr, 3, tile=242, chunk=4) / 255.0,
            "bilinear": upscale_bilinear(lr, 3) / 255.0,
        }
        row = {k: psnr(np.clip(v, 0, 1), hr) for k, v in outs.items()}
        tag = "in-train" if in_train else "HELD-OUT"
        rows.append((name, tag, row))
        print(f"{name:18s} [{tag:8s}] trained {row['trained']:6.2f} dB | "
              f"imagenet {row['imagenet']:6.2f} | "
              f"bilinear {row['bilinear']:6.2f}", flush=True)
    mean = {k: float(np.mean([r[2][k] for r in rows]))
            for k in ("trained", "imagenet", "bilinear")}
    print(f"{'MEAN':18s} [all 4  ] trained {mean['trained']:6.2f} dB | "
          f"imagenet {mean['imagenet']:6.2f} | "
          f"bilinear {mean['bilinear']:6.2f}")


if __name__ == "__main__":
    main()

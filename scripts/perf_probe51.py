"""probe51: does the packed bf16 training tier CONVERGE like f32?

Same init, same batch sequence (a cycling pool of docs-image crops),
1500 steps at batch 32; self-supervised validation PSNR on cartoon_rsa
every 500 steps.  If packed/amp track merged-f32 within ~0.1 dB, the
fast tiers are usable for real training, not just fast at being wrong.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from rusty_sr_tpu.train.data import ImageFolderSupplier
from rusty_sr_tpu.train.loop import TrainConfig, train_loop, validation_psnr
from rusty_sr_tpu.utils.imageio import load_image

STEPS = 1500
BATCH = 32


def main():
    sup = ImageFolderSupplier("/root/reference/docs", crop=(192, 192),
                              shuffle=True, seed=0)
    pool = []
    it = iter(sup)
    for _ in range(64):
        pool.append(np.stack([next(it) for _ in range(BATCH)]))
    val = [load_image("/root/reference/docs/cartoon_rsa.png")]

    for name, kw in (("merged-f32", {}),
                     ("merged-amp", {"amp": True}),
                     ("packed-bf16", {"trunk": "packed"})):
        cfg = TrainConfig(batch_size=BATCH, crop=192, checkpoint_every=500,
                          **kw)

        def batches(n):
            for i in range(n):
                yield pool[i % 64]

        params = train_loop(cfg, batches(STEPS), max_steps=STEPS,
                            log=lambda s: None, seed=11)
        psnr = validation_psnr(params, val, cfg)
        print(f"{name:12s}: final val PSNR {psnr:.3f} dB", flush=True)


if __name__ == "__main__":
    main()

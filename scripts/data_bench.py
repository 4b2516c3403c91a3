"""Host input-pipeline feed rate (VERDICT r3 #1 'done' criterion).

Measures CropPipeline crops/s — cold (first epoch: decode-bound) and
warm (cached: memcpy+convert-bound) — against the device appetite
(packed tier, batch 32: ~5,300 crops/s; merged-f32 b4: ~1,270 crops/s,
PERF.md training table), plus the old single-thread supplier for scale.

Run: PYTHONPATH=/root/repo python scripts/data_bench.py [folder]
(with no folder, synthesises 64 x 512x512 PNGs in a tmp dir — about the
per-host working set of a DIV2K-class folder striped over 8 hosts).
"""

import os
import sys
import tempfile
import time

import numpy as np

# Host-only bench: no device work, don't touch the tunneled TPU.
import jax
jax.config.update("jax_platforms", "cpu")


def synth_folder(n=64, side=512):
    d = tempfile.mkdtemp(prefix="data_bench_")
    from rusty_sr_tpu.utils.imageio import save_image_u8
    rng = np.random.default_rng(0)
    for i in range(n):
        save_image_u8(os.path.join(d, f"img{i:03d}.png"),
                      rng.integers(0, 256, (side, side, 3), np.uint8))
    return d


def bench_pipeline(folder, workers, batch=32, warm_batches=40):
    from rusty_sr_tpu.train.data import CropPipeline
    pipe = CropPipeline(folder, crop=(192, 192), batch_size=batch,
                        workers=workers)
    t0 = time.perf_counter()
    pipe.next_batch()
    first = time.perf_counter() - t0
    # drive to full cache (epoch ~= files/batch more batches)
    n_warmup = max(1, 2 * len(pipe.files) // batch)
    for _ in range(n_warmup):
        pipe.next_batch()
    t0 = time.perf_counter()
    for _ in range(warm_batches):
        pipe.next_batch()
    warm = warm_batches * batch / (time.perf_counter() - t0)
    st = pipe.cache_stats()
    pipe.close()
    print(f"  CropPipeline workers={workers:2d}: warm {warm:8.0f} crops/s "
          f"({warm / batch:6.1f} batches/s at b{batch})  "
          f"first-batch {first * 1e3:.0f} ms  cached {st['cached']}/"
          f"{st['files']} ({st['cache_bytes'] / 1e6:.0f} MB)", flush=True)
    return warm


def bench_old(folder, batch=32, n=6):
    from rusty_sr_tpu.train.data import ImageFolderSupplier, PrefetchBuffer
    sup = ImageFolderSupplier(folder, crop=(192, 192), shuffle=True)
    buf = PrefetchBuffer(sup, depth=128, batch_size=batch)
    buf.next_batch()
    t0 = time.perf_counter()
    for _ in range(n):
        buf.next_batch()
    rate = n * batch / (time.perf_counter() - t0)
    buf.close()
    print(f"  old supplier+buffer (1 thread): {rate:8.0f} crops/s", flush=True)
    return rate


def main():
    folder = sys.argv[1] if len(sys.argv) > 1 else synth_folder()
    print(f"folder: {folder}  cpus: {os.cpu_count()}")
    bench_old(folder)
    for w in (1, 4, 8, 16):
        bench_pipeline(folder, w)


if __name__ == "__main__":
    main()

"""probe61: fpnge-class fast-Huffman PNG encoder (VERDICT r4 #2).

Compares native codec 0 (zlib L1 Z_FILTERED, the round-4 shipping path)
against codec 1 (fh:: dynamic-Huffman, literals + dist-1 runs, no zlib
state machine) on:
  - correctness: PIL must decode every fh file back to the exact pixels
    (fuzz geometries + synthetic content classes);
  - throughput (MPix/s/core, single thread) and file size on
    (a) photo-like content: the docs images upscaled 3x by the net
        (the actual serving payload class),
    (b) flat/synthetic content (screenshots class),
    (c) uniform noise (incompressible floor).

Run: python scripts/perf_probe61_fh_encoder.py
"""

import ctypes
import io
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from PIL import Image
from rusty_sr_tpu.utils import native


def _lib():
    lib = native._png_load()
    assert lib is not None
    return lib


def encode(img, codec, threads=1, level=1):
    lib = _lib()
    h, w, _ = img.shape
    cap = int(lib.sr_png_bound(h, w))
    out = np.empty(cap, np.uint8)
    n = int(lib.sr_png_encode2(np.ascontiguousarray(img), h, w, level,
                               threads, codec, out, cap))
    assert n > 0, n
    return out[:n].tobytes()


def pil_decode(data):
    im = Image.open(io.BytesIO(data))
    return np.asarray(im.convert("RGB"))


def fuzz():
    rng = np.random.default_rng(0)
    cases = []
    for h, w in [(1, 1), (1, 7), (5, 1), (3, 3), (17, 31), (64, 64),
                 (257, 129), (100, 300)]:
        cases.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        cases.append(np.zeros((h, w, 3), np.uint8))
        cases.append(np.full((h, w, 3), 255, np.uint8))
        g = np.linspace(0, 255, h * w * 3).reshape(h, w, 3)
        cases.append(g.astype(np.uint8))
    # long runs crossing the 258 match cap and slab boundaries
    big = np.zeros((600, 400, 3), np.uint8)
    big[300:] = 77
    cases.append(big)
    for threads in (1, 3):
        for i, img in enumerate(cases):
            data = encode(img, codec=1, threads=threads)
            got = pil_decode(data)
            assert got.shape == img.shape, (i, got.shape, img.shape)
            assert (got == img).all(), f"case {i} threads {threads} MISMATCH"
    print(f"fuzz: {len(cases)} cases x 2 thread counts OK")


def content_photo():
    # serving payload class: a 3x-upscaled photo (Lanczos stand-in for the
    # net's HR output — NO tiling: tiled crops hand zlib artificial LZ
    # matches the real payload doesn't have)
    im = Image.open("/root/reference/docs/bank_rs.png").convert("RGB")
    big = im.resize((im.width * 3, im.height * 3), Image.LANCZOS)
    return np.ascontiguousarray(np.asarray(big))


def bench(img, codec, level=1, reps=3):
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        data = encode(img, codec=codec, threads=1, level=level)
        best = min(best, time.perf_counter() - t0)
    mpix = img.shape[0] * img.shape[1] / 1e6
    return mpix / best, len(data)


def main():
    fuzz()
    rng = np.random.default_rng(1)
    photo = content_photo()
    flat = np.zeros((1200, 1600, 3), np.uint8)
    flat[::40] = 200  # screenshot-ish stripes
    noise = rng.integers(0, 256, (1200, 1600, 3), dtype=np.uint8)
    pil_ref = {}
    for name, img in [("photo", photo), ("flat", flat), ("noise", noise)]:
        buf = io.BytesIO()
        t0 = time.perf_counter()
        Image.fromarray(img).convert("RGBA").save(buf, "PNG")
        dt = time.perf_counter() - t0
        pil_ref[name] = (img.shape[0] * img.shape[1] / 1e6 / dt,
                         buf.tell())
    for name, img in [("photo", photo), ("flat", flat), ("noise", noise)]:
        z_r, z_n = bench(img, codec=0)
        f_r, f_n = bench(img, codec=1)
        p_r, p_n = pil_ref[name]
        print(f"{name:6s} ({img.shape[0]}x{img.shape[1]}): "
              f"zlibL1 {z_r:7.1f} MPix/s {z_n/1e6:7.2f} MB | "
              f"fh {f_r:7.1f} MPix/s {f_n/1e6:7.2f} MB "
              f"({f_r/z_r:4.2f}x speed, {f_n/z_n:4.2f}x size) | "
              f"PIL-L6 {p_r:5.1f} MPix/s {p_n/1e6:7.2f} MB")


if __name__ == "__main__":
    main()

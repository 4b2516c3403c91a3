"""probe60: native PNG codec vs PIL — the folder/watch serving limiter.

Context (PERF.md "Folder/watch serving pipeline"): after round 4's
pipelining, folder/watch e2e is encoder-bound — PIL encodes the 3x HR
output at ~2.6 MPix/s/core (adaptive 5-way filter trial + zlib level 6)
vs the chip's 1356.  native/pngio.cc replaces the hot path: fixed Sub
filter (two SIMD passes), zlib level 1 Z_FILTERED, pigz-style parallel
deflate (row slabs, dictionary-primed, Z_FULL_FLUSH concatenation).

Strategy ranking measured here (host-only, run anywhere):
- on REAL image content Z_FILTERED L1 beats Z_RLE/Z_HUFFMAN_ONLY on BOTH
  speed and ratio (RLE/HUFF emit ~2x the bytes; output writes dominate);
  on noise content everything converges to the incompressible floor.
- level 0 (stored) is ~50 MPix/s/core for pipelines that trade disk for
  host CPU (files = raw RGBA size).

Decode side: libpng simplified API reading RGBA-then-strip (PIL
convert("RGB") parity: alpha dropped, never composited) — ~1.4-1.6x PIL.

Result (this 1-core dev host, docs images tiled to ~2.4-5 MPix):
  encode native 13-19 MPix/s vs PIL 1.9-3.1 (5-7x, comparable file size)
  decode native 23-28 MPix/s vs PIL 14-19
On multi-core serving hosts the encode gap widens with the thread knob
(deflate slabs) on top of the per-image writer pool.
"""

import io
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")
from rusty_sr_tpu.utils import native  # noqa: E402

DOCS = "/root/reference/docs"


def bench(fn, reps=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    assert native.png_available(), "native png codec unavailable"
    print(f"{'image':14s} {'MPix':>5s} | {'enc-nat':>8s} {'enc-PIL':>8s} "
          f"{'ratio-nat':>9s} {'ratio-PIL':>9s} | {'dec-nat':>8s} {'dec-PIL':>8s}")
    for name in ("bank_rs", "cartoon_rsa", "butterfly_rs"):
        img = np.asarray(Image.open(f"{DOCS}/{name}.png").convert("RGB"))
        reps = max(1, int(np.ceil(np.sqrt(2.4e6 / (img.shape[0] * img.shape[1])))))
        img = np.tile(img, (reps, reps, 1))
        h, w, _ = img.shape
        mpx = h * w / 1e6

        data_n = native.png_encode(img, level=1)
        assert np.array_equal(
            np.asarray(Image.open(io.BytesIO(data_n)).convert("RGB")), img)
        buf = io.BytesIO()
        Image.fromarray(img).convert("RGBA").save(buf, "PNG")
        data_p = buf.getvalue()

        t_en = bench(lambda: native.png_encode(img, level=1))
        t_ep = bench(lambda: Image.fromarray(img).convert("RGBA")
                     .save(io.BytesIO(), "PNG"))
        t_dn = bench(lambda: native.png_decode(data_p))
        t_dp = bench(lambda: np.asarray(
            Image.open(io.BytesIO(data_p)).convert("RGB")))
        raw = h * w * 4
        print(f"{name:14s} {mpx:5.1f} | {mpx/t_en:8.1f} {mpx/t_ep:8.1f} "
              f"{len(data_n)/raw:9.3f} {len(data_p)/raw:9.3f} | "
              f"{mpx/t_dn:8.1f} {mpx/t_dp:8.1f}")
    print("(MPix/s per core; ratio = file bytes / raw RGBA bytes)")


if __name__ == "__main__":
    main()

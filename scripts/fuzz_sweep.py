"""Offline randomized regression sweep (CPU): geometry x factor x dtype.

Re-runnable version of the round-3 ad-hoc fuzz (~270 cases).  For random
image sizes (incl. primes, tiny, degenerate 1xN) it checks the REAL
pinned invariants (see tests/test_tiling.py — a first draft of this
sweep asserted bitwise identity across *kernels*, which has never been
the contract; cross-kernel bf16 formulations differ by a few u8 codes):

  1. exact f32: tiled_sr == whole-image sr_apply within atol 2e-6
     (f32 accumulation-order class),
  2. exact u8:  tiled_sr bit-identical across tile sizes,
  3. fast u8:   same-kernel tile-size invariance is BITWISE
     (packed even-tile vs even-tile; flat odd-tile vs odd-tile),
     and packed-vs-flat stays in the few-codes bf16 class (<= 8 on
     uniform noise — catastrophic-divergence tripwire, not a quality
     gate; quality is gated on real images in tests/test_quality_budget),
  4. native PNG codec roundtrip == identity and decode == PIL.

Usage:  python scripts/fuzz_sweep.py [seed] [n_cases]
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from rusty_sr_tpu import params as params_lib  # noqa: E402
from rusty_sr_tpu.models.sr_net import sr_apply  # noqa: E402
from rusty_sr_tpu.parallel.tiling import tiled_sr  # noqa: E402
from rusty_sr_tpu.utils import native  # noqa: E402


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_cases = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    rng = np.random.default_rng(seed)
    tree = params_lib.load_builtin("anime", 3)
    whole = jax.jit(sr_apply, static_argnums=(2,))

    fails = []
    for case in range(n_cases):
        kind = case % 4
        h = int(rng.integers(1, 97))
        w = int(rng.integers(1, 97))
        if kind == 0:  # exact f32: tiled vs whole, accumulation class
            tile = int(rng.choice([8, 16, 24, 30, 32]))
            img = rng.random((h, w, 3), np.float32)
            a = np.asarray(tiled_sr(tree, img, 3, tile=tile))
            b = np.asarray(whole(tree, img[None], 3)[0])
            if not np.allclose(a, b, atol=2e-6):
                fails.append(("exact-f32-tiled-vs-whole", h, w, tile))
        elif kind == 1:  # exact u8: bitwise across tile sizes
            t1, t2 = rng.choice([8, 16, 24, 30, 32], 2, replace=False)
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            a = np.asarray(tiled_sr(tree, img, 3, tile=int(t1)))
            b = np.asarray(tiled_sr(tree, img, 3, tile=int(t2)))
            if not np.array_equal(a, b):
                fails.append(("exact-u8-tile-invariance", h, w, t1, t2))
        elif kind == 2:  # fast u8: same-kernel bitwise, cross-kernel class
            te1, te2 = rng.choice([8, 16, 24, 32], 2, replace=False)
            to = int(rng.choice([9, 17, 25, 33]))
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            p1 = np.asarray(tiled_sr(tree, img, 3, tile=int(te1),
                                     compute_dtype=jnp.bfloat16))
            p2 = np.asarray(tiled_sr(tree, img, 3, tile=int(te2),
                                     compute_dtype=jnp.bfloat16))
            fl = np.asarray(tiled_sr(tree, img, 3, tile=to,
                                     compute_dtype=jnp.bfloat16))
            if not np.array_equal(p1, p2):
                fails.append(("packed-tile-invariance", h, w, te1, te2))
            d = int(np.abs(p1.astype(int) - fl.astype(int)).max())
            if d > 8:
                fails.append(("packed-vs-flat-class", h, w, f"{d} codes"))
        else:  # codec roundtrip + PIL differential
            h = int(rng.integers(1, 200))
            w = int(rng.integers(1, 200))
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            level = int(rng.choice([0, 1, 6]))
            threads = int(rng.choice([1, 2, 0]))
            data = native.png_encode(img, level=level, threads=threads)
            out = native.png_decode(data) if data is not None else None
            if out is None or not np.array_equal(out, img):
                fails.append(("codec-roundtrip", h, w, level, threads))
                continue
            import io
            from PIL import Image
            pil = np.asarray(
                Image.open(io.BytesIO(data)).convert("RGB")).reshape(h, w, 3)
            if not np.array_equal(pil, img):
                fails.append(("codec-vs-pil", h, w, level, threads))
        if (case + 1) % 20 == 0:
            print(f"  {case + 1}/{n_cases} cases, {len(fails)} failures",
                  flush=True)

    print(f"fuzz_sweep seed={seed}: {n_cases} cases, "
          f"{len(fails)} failures")
    for f in fails:
        print("  FAIL:", f)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

"""Fused-trunk variant sweep: rank3 dots, bigger blocks w/ raised VMEM."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.ops.pallas.trunk import fused_trunk, pack_trunk_weights, HALO

BATCH, S, FACTOR, ITERS = 8, 256, 3, 20
HR_MPIX = BATCH * S * S * FACTOR * FACTOR / 1e6
h = HALO


def timed(label, fn, x):
    @jax.jit
    def chained(b):
        def body(i, c):
            e = fn(c)
            r = jnp.pad(e[..., :3] * 1e-6, ((0, 0), (h, h), (h, h), (0, 0)))
            return c + r
        return lax.fori_loop(0, ITERS, body, b)

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        comp = time.perf_counter() - t0
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(x))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{label:44s} {best*1e3:8.2f} ms  {HR_MPIX/best:8.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        s = str(ex)
        i = s.find("Mosaic")
        j = s.find("Scoped allocation")
        msg = s[j:j+120] if j >= 0 else (s[i:i+120] if i >= 0 else s[:120])
        print(f"{label:44s} FAILED: {msg}", flush=True)


def main():
    params = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
    packed = pack_trunk_weights(params, FACTOR)
    rng = np.random.default_rng(0)
    xpad = jnp.asarray(rng.random((BATCH, S + 2 * h, S + 2 * h, 3),
                                  dtype=np.float32))

    cases = [
        ("rank3 rh=8 cw=128", dict(rh=8)),
        ("rank3 rh=16 cw=128 vmem=64", dict(rh=16, vmem_mb=64)),
        ("rank3 rh=32 cw=128 vmem=96", dict(rh=32, vmem_mb=96)),
        ("rank3 rh=64 cw=256 vmem=110", dict(rh=64, cw=256, vmem_mb=110)),
    ]
    for label, kw in cases:
        timed(label, lambda c, kw=kw: fused_trunk(
            packed, c, None, FACTOR, compute_dtype=jnp.bfloat16, **kw), xpad)


if __name__ == "__main__":
    main()

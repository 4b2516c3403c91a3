"""Probe 35: emitter rates at packed-trunk shapes (reject-fast check).

The masked-split result (K 108->216 and 75->225 at ZERO cost, probe34)
says the emitter is not K-bound at small K — so maybe the whole trunk
should run in 2x2 space-to-depth space: quarter resolution, 4x channels.
FLOP inflation: convA 1.44x (5x5 -> 3x3x128->384), 3x3 stages 1.78x
(via 4x4 zero-embed -> 2x2x128->4N).  Win conditions on rate:
convA-class 55 -> >=79 TFLOP/s; convB-class 17 -> >=30.

Isolated chained rates at matched element counts (B=24, 256^2 full res
vs 128^2 packed).  Isolated wins invert in-net (PERF.md rule 2), but an
isolated REJECT is decisive: if the fat shape can't hit the threshold
alone, it won't in-net.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu.ops.conv import _conv_native

CD = jnp.bfloat16
ITERS = 10
B = 24
S = 256      # full-res tile side
rng = np.random.default_rng(0)


def rate(name, shape_in, w_shape):
    x0 = jnp.asarray(rng.standard_normal(shape_in).astype(np.float32)) \
        .astype(CD)
    w = jnp.asarray(rng.standard_normal(w_shape).astype(np.float32) * 0.05) \
        .astype(CD)

    def one(t):
        return _conv_native(t, w, jnp.float32, None)

    cin, cout = w_shape[2], w_shape[3]

    def body(i, carry):
        t, s = carry
        o = one(t)
        # fold output back to input shape: slice channels (cout >= cin
        # in all cases here) and re-center
        t2 = (o[..., :cin] * jnp.asarray(1e-3, jnp.float32)).astype(CD)
        return t2, s + o[0, 0, 0, 0]

    @jax.jit
    def loop(t):
        return lax.fori_loop(0, ITERS, body, (t, jnp.float32(0)))

    t0 = time.perf_counter()
    jax.block_until_ready(loop(x0))
    comp = time.perf_counter() - t0
    best = 1e30
    for r in range(3):
        xr = jnp.asarray(
            (rng.standard_normal(shape_in) * (1 + r)).astype(np.float32)
        ).astype(CD)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(xr))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    n, h, wd, _ = shape_in
    kh, kw = w_shape[0], w_shape[1]
    gflop = 2 * n * h * wd * kh * kw * cin * cout / 1e9
    print(f"{name:28s} {per * 1e3:7.2f} ms  {gflop / per / 1e3:6.1f} TF/s "
          f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    # convA class: current vs packed
    rate("convA cur 5x5x32->96", (B, S, S, 32), (5, 5, 32, 96))
    rate("convA pkd 3x3x128->384", (B, S // 2, S // 2, 128), (3, 3, 128, 384))
    # convB class
    rate("convB cur 3x3x32->96", (B, S, S, 32), (3, 3, 32, 96))
    rate("convB pkd 2x2x128->384", (B, S // 2, S // 2, 128), (2, 2, 128, 384))
    # conv10 class (small N)
    rate("conv10 cur 3x3x32->32", (B, S, S, 32), (3, 3, 32, 32))
    rate("conv10 pkd 2x2x128->128", (B, S // 2, S // 2, 128),
         (2, 2, 128, 128))

"""probe48: training-step precision formulations (roadmap #3 — the AMP
backward mystery).

Hypothesis: --amp's 30-80x slowdown is NOT a backward-emitter pathology
but precision=HIGHEST applied to bf16 operands — conv2d_same defaults
to HIGHEST, which on bf16 inputs forces the multi-pass emulation in
both fwd and bwd dots.  Configs (all chained in-jit like probe47):

  f32-highest : today's default (6-pass f32-precision dots)
  f32-high    : im2col dots at Precision.HIGH (3-pass) on f32 data
  amp-default : bf16 operands, im2col dots at DEFAULT (1-pass MXU)
"""

import os
import sys
import time
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import optax

from rusty_sr_tpu import params as P
from rusty_sr_tpu.models.sr_net import merge_params, sr_apply_fused, make_lr_from_hr
from rusty_sr_tpu.ops.conv import _conv_im2col

ITERS = 50
MAC_PER_LR_PX = 130_176
PEAK_BF16 = 197e12


def make_loss(mode, factor=3):
    if mode == "f32-highest":
        cd, conv_fn = None, None
    elif mode == "f32-high":
        cd = None
        conv_fn = lambda x, w: _conv_im2col(  # noqa: E731
            x, w, jnp.float32, lax.Precision.HIGH)
    elif mode == "amp-default":
        cd = jnp.bfloat16
        conv_fn = lambda x, w: _conv_im2col(  # noqa: E731
            x, w, jnp.float32, None)
    else:
        raise SystemExit(mode)

    def loss(params, hr):
        lr = make_lr_from_hr(hr, factor)
        out = sr_apply_fused(merge_params(params), lr, factor,
                             compute_dtype=cd, conv_fn=conv_fn,
                             round_output=False, conv0_split=False)
        return jnp.mean((out - hr) ** 2)
    return loss


def bench(mode, batch, crop=192, rounds=3):
    params = jax.tree.map(jnp.asarray, P.init_params(0, 3))
    opt = optax.adam(2e-3, b1=0.95, b2=0.995, eps=1e-7)
    st = opt.init(params)
    loss = make_loss(mode)
    pool = jnp.asarray(np.random.default_rng(0).random(
        (4, batch, crop, crop, 3), dtype=np.float32))

    @jax.jit
    def chained(params, st, bump):
        def body(i, c):
            p, s = c
            hr = pool[i % 4] * (1.0 + 1e-6 * (i + bump))
            l, grads = jax.value_and_grad(loss)(p, hr)
            updates, s = opt.update(grads, s, p)
            return (optax.apply_updates(p, updates), s)
        return jax.lax.fori_loop(0, ITERS, body, (params, st))

    t0 = time.perf_counter()
    out = jax.block_until_ready(chained(params, st, 0))
    comp = time.perf_counter() - t0
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        out = jax.block_until_ready(chained(out[0], out[1], r + 1))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    flops = 3 * 2 * MAC_PER_LR_PX * batch * (crop // 3) ** 2
    print(f"{mode:12s} batch {batch:3d}: {best * 1e3:8.3f} ms/step  "
          f"{batch / best:8.1f} samples/s  "
          f"MFU {100 * flops / best / PEAK_BF16:5.2f}%  "
          f"(compile {comp:.0f}s)", flush=True)


def main():
    for mode in ("f32-highest", "f32-high", "amp-default"):
        for batch in (4, 32):
            bench(mode, batch)


if __name__ == "__main__":
    main()

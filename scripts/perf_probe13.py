"""Mixed conv lowering: im2col for stage A only, native for conv0+B/C/D
(consecutive native convs share layouts; patches for 3x3 stages cost
~1.2GB HBM each per pass at B=16)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import merge_params
from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import _conv_native, _conv_im2col
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases

BATCH, S, FACTOR, ITERS = 16, 256, 3, 20
HR_MPIX = BATCH * S * S * FACTOR * FACTOR / 1e6
BF = jnp.bfloat16


def make_net(native_set):
    def net(p, x):
        def cv(h, name):
            w = p[name].astype(BF)
            h = h.astype(BF)
            if name in native_set:
                return _conv_native(h, w, jnp.float32, None)
            return _conv_im2col(h, w, jnp.float32, None)

        f = belu(cv(x, "conv0") + p["f_bias"], p["f_belu"])
        a = cv(f, "convA")
        l1 = belu(a[..., :32] + p["l1_bias"], p["l1_belu"])
        b = cv(l1, "convB")
        l2 = belu(a[..., 32:64] + b[..., :32] + p["l2_bias"], p["l2_belu"])
        c = cv(l2, "convC")
        l3 = belu(a[..., 64:96] + b[..., 32:64] + c[..., :32] + p["l3_bias"],
                  p["l3_belu"])
        d = cv(l3, "conv10")
        expand = b[..., 64:91] + c[..., 32:59] + d + p["expand_bias"]
        total = (bilinear_phases(x, FACTOR) + expand).astype(BF)
        return depth_to_space(total, FACTOR)
    return net


def timed(label, fn, p, x):
    @jax.jit
    def chained(b):
        def body(i, c):
            out = fn(p, c)
            return (out[:, :S, :S, :] * 1e-6).astype(c.dtype) + c
        return lax.fori_loop(0, ITERS, body, b)

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        comp = time.perf_counter() - t0
        best = 1e30
        for r in range(3):
            xr = x * (1.0 + 1e-4 * (r + 1))
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            jax.block_until_ready(chained(xr))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{label:40s} {best*1e3:8.2f} ms  {HR_MPIX/best:8.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"{label:40s} FAILED: {str(ex)[:140]}", flush=True)


def main():
    p = merge_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    x = jnp.asarray(np.random.default_rng(0).random(
        (BATCH, S, S, 3), dtype=np.float32))
    timed("conv0 native only (current)", make_net({"conv0"}), p, x)
    timed("conv0+BCD native, A im2col",
          make_net({"conv0", "convB", "convC", "conv10"}), p, x)
    timed("conv0+CD native, A+B im2col",
          make_net({"conv0", "convC", "conv10"}), p, x)


if __name__ == "__main__":
    main()

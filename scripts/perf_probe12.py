"""Surgical variants: native conv0 (im2col concat of the 3-channel input
costs 2.2ms at T(4,128) tiling) and bf16 base-phase path."""

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


def make_net(conv0_native: bool, base_bf16: bool):
    def net(p, x):
        def cv(h, name, native=False):
            w = p[name].astype(BF)
            h = h.astype(BF)
            if native:
                return _conv_native(h, w, jnp.float32, None)
            return _conv_im2col(h, w, jnp.float32, None)

        f = belu(cv(x, "conv0", native=conv0_native) + p["f_bias"], p["f_belu"])
        a = cv(f, "convA")
        l1 = belu(a[..., :32] + p["l1_bias"], p["l1_belu"])
        b = cv(l1, "convB")
        l2 = belu(a[..., 32:64] + b[..., :32] + p["l2_bias"], p["l2_belu"])
        c = cv(l2, "convC")
        l3 = belu(a[..., 64:96] + b[..., 32:64] + c[..., :32] + p["l3_bias"],
                  p["l3_belu"])
        d = cv(l3, "conv10")
        expand = b[..., 64:91] + c[..., 32:59] + d + p["expand_bias"]
        if base_bf16:
            ph = bilinear_phases(x.astype(BF), FACTOR)
            total = ph + expand.astype(BF)
        else:
            ph = bilinear_phases(x, FACTOR)
            total = (ph + expand).astype(BF)
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
        print(f"{label:36s} {best*1e3:8.2f} ms  {HR_MPIX/best:8.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"{label:36s} FAILED: {str(ex)[:140]}", flush=True)


def main():
    p = merge_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    x = jnp.asarray(np.random.default_rng(0).random(
        (BATCH, S, S, 3), dtype=np.float32))
    timed("baseline (im2col conv0, f32 base)", make_net(False, False), p, x)
    timed("native conv0", make_net(True, False), p, x)
    timed("native conv0 + bf16 base", make_net(True, True), p, x)


if __name__ == "__main__":
    main()

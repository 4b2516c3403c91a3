"""Decompose the XLA merged net: trunk vs depth_to_space vs bilinear base.

Also tests a bf16 base path (bilinear + residual add in bf16, one final
f32 cast) — the base/d2s ops are HR-sized (9x the LR pixel count) and
f32, so they may dominate HBM traffic.
"""

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
from rusty_sr_tpu.ops.conv import _conv_native
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import upsample_bilinear

BATCH, S, FACTOR, ITERS = 8, 256, 3, 20
HR_MPIX = BATCH * S * S * FACTOR * FACTOR / 1e6
BF = jnp.bfloat16


def trunk(p, x, dtype=BF):
    def cv(h, name):
        return _conv_native(h.astype(dtype), p[name].astype(dtype),
                            jnp.float32, None).astype(dtype)
    f = belu(cv(x, "conv0") + p["f_bias"].astype(dtype), p["f_belu"].astype(dtype))
    a = cv(f, "convA")
    l1 = belu(a[..., :32] + p["l1_bias"].astype(dtype), p["l1_belu"].astype(dtype))
    b = cv(l1, "convB")
    l2 = belu(a[..., 32:64] + b[..., :32] + p["l2_bias"].astype(dtype),
              p["l2_belu"].astype(dtype))
    c = cv(l2, "convC")
    l3 = belu(a[..., 64:96] + b[..., 32:64] + c[..., :32]
              + p["l3_bias"].astype(dtype), p["l3_belu"].astype(dtype))
    d = cv(l3, "conv10")
    return b[..., 64:91] + c[..., 32:59] + d + p["expand_bias"].astype(dtype)


def timed(label, fn, x):
    @jax.jit
    def chained(b):
        def body(i, c):
            out = fn(c)
            return (out[:, :S, :S, :3] * 1e-6).astype(c.dtype) + c
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
        print(f"{label:40s} {best*1e3:8.2f} ms  {HR_MPIX/best:8.1f} MPix/s "
              f"(compile {comp:.0f}s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"{label:40s} FAILED: {str(ex)[:160]}", flush=True)


def main():
    params = merge_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, S, S, 3), dtype=np.float32), BF)

    timed("trunk only (expand, LR-sized)", lambda b: trunk(params, b), x)
    timed("trunk + d2s (bf16)",
          lambda b: depth_to_space(trunk(params, b), FACTOR), x)
    timed("full: d2s + bf16 base",
          lambda b: (depth_to_space(trunk(params, b), FACTOR)
                     + upsample_bilinear(b, FACTOR)), x)
    timed("base only (bf16 bilinear)",
          lambda b: upsample_bilinear(b, FACTOR), x)


if __name__ == "__main__":
    main()

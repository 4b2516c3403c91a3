"""Probe 31: numeric accuracy of conv0 lowerings vs f64 ground truth.

Probe 30 ties the fast-tier quality regression to s2d conv0, yet the
packed form is provably the same set of products (same bf16-rounded
weights and inputs, f32 accumulation requested via
preferred_element_type).  If the measured error differs by far more than
f32 summation-order noise (~1e-7 rel), the emitter computes one of the
shapes at lower effective precision.  Measured here directly: u8-exact
bf16 inputs, both lowerings, error vs an f64 numpy reference.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import _conv0_s2d_weights
from rusty_sr_tpu.ops.conv import _conv_native

CD = jnp.bfloat16
rng = np.random.default_rng(0)

params = load_builtin("imagenet")
w0 = np.asarray(params["conv0"], np.float32) * (256.0 / 255.0)  # (5,5,3,32)
w0_bf = np.asarray(jnp.asarray(w0).astype(CD).astype(jnp.float32))

N, S = 4, 64
img = rng.integers(0, 256, (N, S, S, 3), dtype=np.uint8)
t8 = img.astype(np.float64) * 2.0 ** -8  # exact in bf16


def ref_f64():
    """Zero-pad Same conv in f64 with the bf16-rounded weights."""
    xp = np.pad(t8, ((0, 0), (2, 2), (2, 2), (0, 0)))
    out = np.zeros((N, S, S, 32))
    for u in range(5):
        for v in range(5):
            out += np.einsum("nhwc,co->nhwo",
                             xp[:, u:u + S, v:v + S, :],
                             w0_bf[u, v].astype(np.float64))
    return out


def direct():
    t = jnp.asarray(img).astype(CD) * jnp.asarray(2.0 ** -8, CD)
    w = jnp.asarray(w0).astype(CD)
    return np.asarray(jax.jit(
        lambda a, b: _conv_native(a, b, jnp.float32, None))(t, w))


def s2d():
    w2 = jnp.asarray(_conv0_s2d_weights(jnp.asarray(w0))).astype(CD)
    s = img.reshape(N, S // 2, 2, S // 2, 2, 3) \
           .transpose(0, 1, 3, 2, 4, 5).reshape(N, S // 2, S // 2, 12)
    t = jnp.asarray(s).astype(CD) * jnp.asarray(2.0 ** -8, CD)
    o = np.asarray(jax.jit(
        lambda a, b: _conv_native(a, b, jnp.float32, None))(t, w2))
    return o.reshape(N, S // 2, S // 2, 2, 2, 32) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(N, S, S, 32)


def im2col_s2d():
    """Same packed shape, but the dot via explicit im2col (jnp.dot)."""
    from rusty_sr_tpu.ops.conv import _conv_im2col
    w2 = jnp.asarray(_conv0_s2d_weights(jnp.asarray(w0))).astype(CD)
    s = img.reshape(N, S // 2, 2, S // 2, 2, 3) \
           .transpose(0, 1, 3, 2, 4, 5).reshape(N, S // 2, S // 2, 12)
    t = jnp.asarray(s).astype(CD) * jnp.asarray(2.0 ** -8, CD)
    o = np.asarray(jax.jit(
        lambda a, b: _conv_im2col(a, b, jnp.float32, None))(t, w2))
    return o.reshape(N, S // 2, S // 2, 2, 2, 32) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(N, S, S, 32)


if __name__ == "__main__":
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    ref = ref_f64()
    scale = np.abs(ref).mean()
    for name, fn in [("direct", direct), ("s2d", s2d),
                     ("im2col_s2d", im2col_s2d)]:
        out = fn().astype(np.float64)
        err = np.abs(out - ref)
        print(f"{name:12s} max {err.max():.3e}  mean {err.mean():.3e}  "
              f"rel {err.max() / scale:.3e}", flush=True)

"""Int8 trunk: quantized conv stages for the throughput tier.

The bf16 fast path is HBM-bound reading im2col patches (~570 GB/s,
scripts/perf_probe*.py); int8 halves patch bytes and the v5e MXU runs
int8 x int8 -> int32 at 2x bf16 rate (394 TOPS).  Scheme:

- conv0 (1.8% of FLOPs) stays exact — it reads the raw image.
- Weights: static per-output-channel symmetric scales
  (sw[o] = max|W[:,o]| / 127).
- Activations: dynamic per-tensor symmetric scale (max-abs / 127) —
  one cheap reduction per stage vs the 100x-larger patch traffic.
- Accumulation int32, dequantised in the f32 epilogue (bias + BeLU),
  then re-quantised for the next stage.
- The bilinear base stays exact f32 (it carries the image); only the
  learned residual trunk is quantised.

Quality is strictly a fast-tier tradeoff — the exact f32 path is the
default and the golden tests gate on it.  Measured deltas are recorded in
tests/test_quant.py and CLAUDE.md.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import conv2d_same
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases

_QCONVS = ("convA", "convB", "convC", "conv10")


def quantize_trunk(mparams):
    """merge_params output -> int8 weights + f32 per-channel scales."""
    q = {"conv0": jnp.asarray(mparams["conv0"], jnp.bfloat16)}
    for name in _QCONVS:
        w = jnp.asarray(mparams[name], jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
        q[name + "_q"] = jnp.round(w / sw).astype(jnp.int8)
        q[name + "_s"] = sw
    for name in ("f_bias", "f_belu", "l1_bias", "l1_belu", "l2_bias",
                 "l2_belu", "l3_bias", "l3_belu", "expand_bias"):
        q[name] = jnp.asarray(mparams[name], jnp.float32)
    return q


def _quant_act(x):
    """f32 activation -> (int8, scale). Per-tensor symmetric max-abs."""
    s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _conv_q8(xq, sx, wq, sw):
    """int8 Same conv via im2col + int32 dot, dequantised to f32."""
    kh, kw, cin, cout = wq.shape
    ph, pw = kh // 2, kw // 2
    n, h, wd, _ = xq.shape
    xp = jnp.pad(xq, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    patches = [
        lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, wd, cin))
        for dy in range(kh) for dx in range(kw)
    ]
    pat = jnp.concatenate(patches, axis=-1)
    wf = wq.reshape(kh * kw * cin, cout)
    acc = lax.dot_general(
        pat, wf, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * sw)


def sr_apply_q8(q, x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """Int8-trunk SR forward. x: (N,H,W,3) f32 -> (N,fH,fW,3) f32."""
    e = x.shape[-1] * factor * factor

    f = belu(conv2d_same(x.astype(jnp.bfloat16), q["conv0"]).astype(jnp.float32)
             + q["f_bias"], q["f_belu"])

    fq, sf = _quant_act(f)
    a = _conv_q8(fq, sf, q["convA_q"], q["convA_s"])
    l1 = belu(a[..., :32] + q["l1_bias"], q["l1_belu"])

    l1q, s1 = _quant_act(l1)
    b = _conv_q8(l1q, s1, q["convB_q"], q["convB_s"])
    l2 = belu(a[..., 32:64] + b[..., :32] + q["l2_bias"], q["l2_belu"])

    l2q, s2 = _quant_act(l2)
    c = _conv_q8(l2q, s2, q["convC_q"], q["convC_s"])
    l3 = belu(a[..., 64:96] + b[..., 32:64] + c[..., :32] + q["l3_bias"],
              q["l3_belu"])

    l3q, s3 = _quant_act(l3)
    d = _conv_q8(l3q, s3, q["conv10_q"], q["conv10_s"])
    expand = (b[..., 64:64 + e] + c[..., 32:32 + e] + d + q["expand_bias"])

    total = bilinear_phases(x, factor) + expand
    return depth_to_space(total.astype(jnp.bfloat16), factor)

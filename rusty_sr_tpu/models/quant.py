"""Int8 trunk v2: calibrated, asymmetric, per-channel quantisation.

The bf16 fast path is HBM-bound reading im2col patches (~570 GB/s,
scripts/perf_probe*.py); int8 halves patch bytes and the v5e MXU runs
int8 x int8 -> int32 at 2x bf16 rate (394 TOPS).

Round-1 scheme (per-TENSOR dynamic activation scales) measured 45 dB vs
exact: the global max-abs reduction serialised the graph and spent the
whole int8 code budget on the hottest channel.  v2 (each step measured,
see git history of this file + CLAUDE.md):

- Per-channel ASYMMETRIC activation quantisation with calibrated ranges:
  ``xq = round(x/s[c]) + z[c]`` with s = (hi-lo)/254.  BeLU outputs are
  one-sided for the p=0 channels, so a zero-point nearly doubles their
  resolution (53.1 -> 54.1 dB on the golden image).  The zero-point
  contribution is a per-output constant folded into the dequant epilogue:
  zero-padding stays exact because the f32 activation is padded BEFORE
  quantisation and x=0 maps to exactly z (ranges are forced to include 0).
- Activation scales fold into the next conv's weights along the input
  channel (y[o] = sum_c (W[..,c,o]*s[c]) * (xq[c]-z[c])); the folded
  weights then quantise DOUBLE-DOT: int8 main + int8 residual, i.e. two
  MXU passes over the same patches.  Weight-quant error (which the sx
  folding amplifies: measured 47.7 -> 50.5 dB) becomes negligible while
  patch HBM traffic — the actual bottleneck — is unchanged.
- conv10 stays bf16: its input (l3) feeds the output residual directly,
  and un-quantising just that stage lifts the ceiling past 55 dB for
  +1/3 of one patch stream in extra bytes.  conv0 stays bf16 (native
  emitter) — it reads the raw image; measured cost ~0.2 dB.
- The bilinear base and the final sum stay f32 (the u8 product path
  quantises to u8 codes BEFORE depth_to_space, so the full f32 quality
  arrives in the PNG for free).

Measured on the golden image (tests/test_quant.py): 54.9 dB vs the exact
output — the fake-quant ceiling of int8 activations at these calibrated
ranges is 54.1 dB with all four stages quantised, 55.4 with conv10 kept
high-precision; this implementation sits at that ceiling, i.e. the
remaining error is pure int8 activation rounding, not scheme loss.

Quality is strictly a fast-tier tradeoff — the exact f32 path is the
default and the golden tests gate on it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import conv2d_same
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases

# int8 stages: activation name -> merged conv consuming it
_Q_STAGES = (("f", "convA"), ("l1", "convB"), ("l2", "convC"))


@jax.jit
def _act_minmax(mparams, x):
    """Per-channel (min, max) of the trunk activations on sample x, each
    range forced to include 0 so zero-padding is exactly representable.

    Runs the exact (f32) merged forward — calibration cost is one pass
    over a small sample.
    """
    p = mparams
    n = p["f_bias"].shape[0]

    def cv(h, name):
        return conv2d_same(h, p[name])

    f = belu(cv(x, "conv0") + p["f_bias"], p["f_belu"])
    a = cv(f, "convA")
    l1 = belu(a[..., :n] + p["l1_bias"], p["l1_belu"])
    b = cv(l1, "convB")
    l2 = belu(a[..., n:2 * n] + b[..., :n] + p["l2_bias"], p["l2_belu"])
    rng = lambda t: (jnp.minimum(t.min(axis=(0, 1, 2)), 0.0),  # noqa: E731
                     jnp.maximum(t.max(axis=(0, 1, 2)), 0.0))
    return {"f": rng(f), "l1": rng(l1), "l2": rng(l2)}


def calibrate_act_scales(mparams, sample_x, margin: float = 0.05,
                         microbatch: int = 4) -> dict:
    """Per-channel asymmetric int8 activation ranges from a sample.

    ``sample_x``: (N,H,W,3) f32 sRGB sample (tiles sampled across the
    target image work well — self-calibration).  ``margin`` widens the
    ranges to absorb off-sample extremes (saturation clips the rest).
    Returns {stage: (lo, hi)}.

    The sample runs through the exact f32 forward in ``microbatch``-
    sized slices with per-channel min/max folded across slices: a
    whole-sample pass materialises im2col patches that were the HBM
    high-water of the entire system (~0.3 GB/tile at tile=242 — the
    measured OOM in PERF.md probe45b); micro-batching caps the peak at
    ~1.3 GB with identical resulting ranges (min/max is associative).
    """
    x = jnp.asarray(sample_x, jnp.float32)
    pad = (-x.shape[0]) % microbatch
    if pad:  # duplicate tiles: min/max unchanged, ONE executable shape
        # modular indexing, not x[:pad] — a sample SMALLER than the
        # microbatch (single-tile image) must still pad to full size
        x = jnp.concatenate([x, x[jnp.arange(pad) % x.shape[0]]])
    mm: dict = {}
    for i in range(0, x.shape[0], microbatch):
        part = _act_minmax(mparams, x[i:i + microbatch])
        for k, (lo, hi) in part.items():
            if k in mm:
                mm[k] = (jnp.minimum(mm[k][0], lo),
                         jnp.maximum(mm[k][1], hi))
            else:
                mm[k] = (lo, hi)
    g = 1.0 + margin
    return {k: (lo * g, hi * g) for k, (lo, hi) in mm.items()}


def quantize_trunk(mparams, act_ranges: dict) -> dict:
    """merge_params output + calibrated ranges -> int8 trunk params."""
    q = {"conv0": jnp.asarray(mparams["conv0"], jnp.bfloat16),
         "conv10": jnp.asarray(mparams["conv10"], jnp.bfloat16)}
    for act, conv in _Q_STAGES:
        lo, hi = act_ranges[act]
        s = jnp.maximum((hi - lo) / 254.0, 1e-7)        # (Cin,)
        z = jnp.round(-127.0 - lo / s)                  # x=0 -> code z
        w = jnp.asarray(mparams[conv], jnp.float32) * s[None, None, :, None]
        sw1 = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        wq1 = jnp.round(w / sw1).astype(jnp.int8)
        r = w - wq1.astype(jnp.float32) * sw1           # double-dot residual
        sw2 = jnp.maximum(jnp.max(jnp.abs(r), axis=(0, 1, 2)), 1e-20) / 127.0
        wq2 = jnp.round(r / sw2).astype(jnp.int8)
        q[conv + "_q1"], q[conv + "_s1"] = wq1, sw1
        q[conv + "_q2"], q[conv + "_s2"] = wq2, sw2
        q[act + "_invs"], q[act + "_z"] = 1.0 / s, z
        # zero-point correction: sum_{c,k} Wq[c,k,o]*sw[o]*z[c], a
        # per-output constant subtracted in the dequant epilogue
        zc = ((wq1.astype(jnp.float32) * sw1 + wq2.astype(jnp.float32) * sw2)
              * z[None, None, :, None]).sum(axis=(0, 1, 2))
        q[conv + "_zc"] = zc
    for name in ("f_bias", "f_belu", "l1_bias", "l1_belu", "l2_bias",
                 "l2_belu", "l3_bias", "l3_belu", "expand_bias"):
        q[name] = jnp.asarray(mparams[name], jnp.float32)
    return q


def _conv_q8(x, q, act, conv):
    """Asymmetric int8 Same conv: pad f32 -> quantise -> im2col ->
    double-dot int32 -> dequant f32 (zero-point folded out)."""
    wq1 = q[conv + "_q1"]
    kh, kw, cin, cout = wq1.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    xq = jnp.clip(jnp.round(xp * q[act + "_invs"]) + q[act + "_z"],
                  -127, 127).astype(jnp.int8)
    from rusty_sr_tpu.ops.conv import im2col_patches
    pat = im2col_patches(xq, kh, kw)  # shared patch-order contract

    def dot(wq):
        return lax.dot_general(
            pat, wq.reshape(kh * kw * cin, cout),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)

    return (dot(wq1) * q[conv + "_s1"] + dot(q[conv + "_q2"]) * q[conv + "_s2"]
            - q[conv + "_zc"])


def q8_expand(q, x: jnp.ndarray, factor: int, mask=None) -> jnp.ndarray:
    """Int8 trunk -> LR-space residual phases (N,H,W,3*f^2) in f32.

    ``mask`` (optional, (N,H,W,1) f32) reproduces true-image-border zeros
    for the overlap-tile path (see parallel.tiling); masked zeros quantise
    to exactly the zero-point, preserving Same-pad semantics.
    """
    e = x.shape[-1] * factor * factor
    n = q["f_bias"].shape[0]
    msk = (lambda t: t) if mask is None else (lambda t: mask * t)

    from rusty_sr_tpu.ops.conv import _conv_native
    f = msk(belu(_conv_native(x.astype(jnp.bfloat16), q["conv0"],
                              jnp.float32, None) + q["f_bias"], q["f_belu"]))
    a = _conv_q8(f, q, "f", "convA")
    l1 = msk(belu(a[..., :n] + q["l1_bias"], q["l1_belu"]))
    b = _conv_q8(l1, q, "l1", "convB")
    l2 = msk(belu(a[..., n:2 * n] + b[..., :n] + q["l2_bias"], q["l2_belu"]))
    c = _conv_q8(l2, q, "l2", "convC")
    l3 = msk(belu(a[..., 2 * n:3 * n] + b[..., n:2 * n] + c[..., :n]
                  + q["l3_bias"], q["l3_belu"]))
    # bf16 im2col dot — the same formulation the bf16 fast path uses
    # (native conv measured slower at these shapes; ops/conv.py notes)
    d = conv2d_same(l3.astype(jnp.bfloat16), q["conv10"]).astype(jnp.float32)
    return b[..., 2 * n:2 * n + e] + c[..., n:n + e] + d + q["expand_bias"]


def sr_apply_q8(q, x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """Int8-trunk SR forward. x: (N,H,W,3) f32 -> (N,fH,fW,3) f32."""
    expand = q8_expand(q, x, factor)
    return depth_to_space(bilinear_phases(x, factor) + expand, factor)

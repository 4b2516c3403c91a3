"""The SR network, bilinear baseline, and downsample paths.

The reference builds a mutable alumina `Graph` in `sr_net` (reference
src/network.rs:16-109) where multiple operations writing one node accumulate
additively (SURVEY.md §8.4).  TPU-native there is no graph object at all:
the network is a pure function over a param pytree, accumulation is `+`,
and XLA traces/fuses the whole thing into a handful of MXU conv kernels
with fused epilogues.

Topology (inference; reference src/network.rs:27-72, SURVEY.md §2.3):

    base   = LinearInterp_f(input)                      # sRGB-domain bilinear
    f      = BeLU(conv0_5x5(input) + f_bias)
    l1     = BeLU(conv1_5x5(f) + l1_bias)
    l2     = BeLU(conv2_5x5(f) + conv5_3x3(l1) + l2_bias)
    l3     = BeLU(conv3_5x5(f) + conv6_3x3(l1) + conv8_3x3(l2) + l3_bias)
    expand = conv7_3x3(l1) + conv9_3x3(l2) + conv10_3x3(l3) + expand_bias
    output = base + depth_to_space_f(expand)

i.e. bilinear-upsampled base plus an ESPCN-style learned sub-pixel residual
over a DenseNet-ish low-res trunk.  130,459 params at factor 3.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.color import srgb_to_linear, linear_to_srgb
from rusty_sr_tpu.ops.conv import conv2d_same
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import upsample_bilinear, avg_pool, bilinear_phases


def sr_apply(params, x: jnp.ndarray, factor: int = 3, *, compute_dtype=None,
             conv_fn=None) -> jnp.ndarray:
    """SR forward pass. x: (N,H,W,3) sRGB f32 in [0,1] -> (N,fH,fW,3).

    ``compute_dtype`` optionally runs the conv trunk in bf16 for MXU
    throughput (params and the residual sum stay f32 for parity headroom).
    """
    base = upsample_bilinear(x, factor)  # src/network.rs:27

    xc = x if compute_dtype is None else x.astype(compute_dtype)
    _conv = conv_fn or conv2d_same

    def cv(h, name):
        w = params[name]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
            h = h.astype(compute_dtype)
        return _conv(h, w)

    f = belu(cv(xc, "conv0") + params["f_bias"], params["f_belu"])       # :33-35
    l1 = belu(cv(f, "conv1") + params["l1_bias"], params["l1_belu"])     # :60
    l2 = belu(cv(f, "conv2") + cv(l1, "conv5") + params["l2_bias"],
              params["l2_belu"])                                          # :61,65
    l3 = belu(cv(f, "conv3") + cv(l1, "conv6") + cv(l2, "conv8")
              + params["l3_bias"], params["l3_belu"])                     # :62,66,69
    expand = (cv(l1, "conv7") + cv(l2, "conv9") + cv(l3, "conv10")
              + params["expand_bias"])                                    # :67,70,72,38
    residual = depth_to_space(expand, factor)                             # :39
    return base + residual.astype(base.dtype)                             # §8.4 accumulation


def merge_params(params, as_jax: bool = True):
    """Concatenate same-source conv weights for the fused apply path.

    The DenseNet trunk issues three 5x5 convs from f_activ (conv1/2/3),
    three 3x3 from l1 (conv5/6/7), two from l2 (conv8/9) and one from l3
    (conv10) — each only 27-32 output channels, which strands 3/4 of the
    MXU's 128 lanes.  Concatenating along O is mathematically identical
    (conv is linear in the kernel) and turns the dominant stage into one
    96-wide matmul.  Done once at load time.
    """
    xp = jnp if as_jax else np
    m = dict(params)
    m["convA"] = xp.concatenate([xp.asarray(params[k]) for k in
                                 ("conv1", "conv2", "conv3")], axis=3)
    m["convB"] = xp.concatenate([xp.asarray(params[k]) for k in
                                 ("conv5", "conv6", "conv7")], axis=3)
    m["convC"] = xp.concatenate([xp.asarray(params[k]) for k in
                                 ("conv8", "conv9")], axis=3)
    for k in ("conv1", "conv2", "conv3", "conv5", "conv6", "conv7",
              "conv8", "conv9"):
        del m[k]
    return m


def sr_apply_fused(mparams, x: jnp.ndarray, factor: int = 3, *,
                   compute_dtype=None, conv_fn=None,
                   round_output: bool = True,
                   conv0_split: bool = True) -> jnp.ndarray:
    """sr_apply over `merge_params` output — identical math, wide convs.

    The bilinear base is added in LR space as phase images
    (ops.resize.bilinear_phases) so the only HR-sized op is the final
    depth_to_space — measured 3.7 ms/pass cheaper than an HR-space add at
    8x256^2 on v5e (scripts/perf_probe6.py).

    ``round_output=False`` keeps the output f32 under ``compute_dtype``
    (training wants an unquantised loss surface; the <=1/512 inference
    rounding would add noise that dominates MSE gradients past ~58 dB).
    ``conv0_split=False`` uses the plain-cast conv0 instead of the
    two-term bf16 weight split under ``compute_dtype`` — required for
    differentiation (the split conv's f32-accum backward mixes dtypes in
    `conv_general_dilated`), and matches the AMP semantics `sr_apply`
    has always had (single bf16 rounding of the conv0 input).
    """
    p = mparams
    e = x.shape[-1] * factor * factor

    _conv = conv_fn or conv2d_same

    def cv(h, name, native=False):
        w = p[name]
        if compute_dtype is not None:
            if native and conv_fn is None and conv0_split:
                # conv0 reads the raw image: rounding it to bf16 costs
                # 3.4 dB for 1.8% of FLOPs.  Three-term masked bf16 split
                # of input AND weights (hi*w_hi + hi*w_lo + lo*w_hi as a
                # single K=225 dot) gives Precision.HIGH-class conv0 on
                # pure MXU bf16 passes (ops.conv.conv_split_precise —
                # bit-level split XLA cannot fold away, probe29-34; its
                # custom VJP is the plain bf16-cast conv gradient, so
                # jax.grad over the DEFAULT arguments works).
                from rusty_sr_tpu.ops.conv import conv_split_precise
                return conv_split_precise(h, w)
            w = w.astype(compute_dtype)
            h = h.astype(compute_dtype)
        return _conv(h, w)

    n = p["f_bias"].shape[0]   # trunk width (32 default, width-generic)
    f = belu(cv(x, "conv0", native=True) + p["f_bias"], p["f_belu"])
    a = cv(f, "convA")                                   # (…, 3n)
    l1 = belu(a[..., :n] + p["l1_bias"], p["l1_belu"])
    b = cv(l1, "convB")                                  # (…, 2n+e)
    l2 = belu(a[..., n:2 * n] + b[..., :n] + p["l2_bias"], p["l2_belu"])
    c = cv(l2, "convC")                                  # (…, n+e)
    l3 = belu(a[..., 2 * n:3 * n] + b[..., n:2 * n] + c[..., :n]
              + p["l3_bias"], p["l3_belu"])
    expand = (b[..., 2 * n:2 * n + e] + c[..., n:n + e] + cv(l3, "conv10")
              + p["expand_bias"])
    base_ph = bilinear_phases(x, factor)
    total = base_ph + expand.astype(base_ph.dtype)  # base+sum in f32
    if compute_dtype is not None and round_output:
        # only the final value is rounded (<= 1/512 on [0,1] => <=1 u8 code);
        # keeps the big HR-sized shuffle in bf16.
        total = total.astype(compute_dtype)
    return depth_to_space(total, factor)


def sr_apply_packed(mparams, x: jnp.ndarray, factor: int = 3, *,
                    compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """TRAINING variant of the inference packed-s2d trunk: the whole net
    at quarter resolution / 4x channels (parallel.tiling packing, which
    lifted inference ~2.5x to the 1356 MPix/s headline — PERF.md),
    expressed in differentiable ops
    (im2col dots at DEFAULT precision — `conv_general_dilated` cannot
    differentiate mixed bf16/f32 operand gradients) so
    `jax.value_and_grad` flows back through the traced weight packing to
    the 19 reference tensors.  Requires even H, W (training crops are).
    Same products as the flat net in the bf16 class; no mask/halo —
    zero Same-padding in packed space equals zero padding in the
    original space for even crops.
    """
    from rusty_sr_tpu.ops.conv import _conv_im2col
    from rusty_sr_tpu.parallel.tiling import (_conv0_s2d_weights,
                                              _s2d_conv_weights)

    cd = compute_dtype
    p = mparams
    n = p["f_bias"].shape[0]
    e = p["expand_bias"].shape[0]
    N, H, W, C = x.shape
    xp = x.reshape(N, H // 2, 2, W // 2, 2, C) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(N, H // 2, W // 2, 4 * C)

    def cv(t, w):
        return _conv_im2col(t.astype(cd), w.astype(cd), jnp.float32, None)

    def tl(v):
        return jnp.tile(v, 4)

    f_ = belu(cv(xp, _conv0_s2d_weights(p["conv0"]))
              + tl(p["f_bias"]), tl(p["f_belu"]))
    a = cv(f_, _s2d_conv_weights(p["convA"], [n, n, n]))
    Nn = 4 * n
    l1 = belu(a[..., :Nn] + tl(p["l1_bias"]), tl(p["l1_belu"]))
    b = cv(l1, _s2d_conv_weights(p["convB"], [n, n, e]))
    l2 = belu(a[..., Nn:2 * Nn] + b[..., :Nn] + tl(p["l2_bias"]),
              tl(p["l2_belu"]))
    c = cv(l2, _s2d_conv_weights(p["convC"], [n, e]))
    l3 = belu(a[..., 2 * Nn:3 * Nn] + b[..., Nn:2 * Nn] + c[..., :Nn]
              + tl(p["l3_bias"]), tl(p["l3_belu"]))
    d = cv(l3, _s2d_conv_weights(p["conv10"], [e]))
    total = (b[..., 2 * Nn:2 * Nn + 4 * e] + c[..., Nn:Nn + 4 * e] + d
             + tl(p["expand_bias"]))
    expand = total.reshape(N, H // 2, W // 2, 2, 2, e) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(N, H, W, e)
    base_ph = bilinear_phases(x, factor)
    return depth_to_space(base_ph + expand.astype(base_ph.dtype), factor)


def bilinear_apply(x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """`-p bilinear` path: sRGB→linear → bilinear ×f → linear→sRGB
    (reference src/network.rs:111-123)."""
    return linear_to_srgb(upsample_bilinear(srgb_to_linear(x), factor))


def downsample_apply(x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """`--downsample` path: sRGB→linear → f×f mean pool → linear→sRGB
    (reference src/network.rs:125-138)."""
    return linear_to_srgb(avg_pool(srgb_to_linear(x), factor))


def make_lr_from_hr(hr: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """In-graph self-supervised pair synthesis used by training
    (reference src/network.rs:87-92): identical math to `downsample_apply`."""
    return downsample_apply(hr, factor)

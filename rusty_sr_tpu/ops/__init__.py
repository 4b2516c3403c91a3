"""Exact op library — every op unit-tested against SURVEY.md §8.

All ops are pure jnp/lax functions on NHWC f32 tensors, written so XLA can
fuse the elementwise work (BeLU, bias, sRGB curves) into the surrounding
conv/reduce kernels on TPU.
"""

from rusty_sr_tpu.ops.activations import belu  # noqa: F401
from rusty_sr_tpu.ops.color import srgb_to_linear, linear_to_srgb  # noqa: F401
from rusty_sr_tpu.ops.conv import conv2d_same  # noqa: F401
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space, space_to_depth  # noqa: F401
from rusty_sr_tpu.ops.resize import upsample_bilinear, avg_pool  # noqa: F401

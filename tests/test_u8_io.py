"""u8-I/O tiled path: device-side conversion/quantisation must equal the
host-side f32 path exactly (for u8 image sources)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import tiled_sr
from rusty_sr_tpu.utils.imageio import load_image, load_image_u8, to_u8


@pytest.fixture(scope="module")
def anime():
    return {k: jnp.asarray(v) for k, v in load_builtin("anime").items()}


def test_u8_path_matches_f32_path(anime):
    u8 = load_image_u8("/root/reference/docs/cartoon_lr.png")[:48, :64]
    f32 = u8.astype(np.float32) / 255.0
    out_u8 = tiled_sr(anime, u8, 3, tile=16, chunk=4)
    out_f32 = tiled_sr(anime, f32, 3, tile=16, chunk=4)
    assert out_u8.dtype == np.uint8
    # device quantisation == host quantisation rule (floor(x*255+0.5))
    diff = np.abs(out_u8.astype(int) - to_u8(out_f32).astype(int))
    assert diff.max() <= 1           # f32 rounding at exact .5 boundaries
    assert (diff > 0).mean() < 1e-3


def test_u8_path_golden(anime):
    u8 = load_image_u8("/root/reference/docs/cartoon_lr.png")
    gold = (load_image("/root/reference/docs/cartoon_rsa.png") * 255
            ).round().astype(np.uint8)
    out = tiled_sr(anime, u8, 3, tile=50, chunk=4)
    assert np.abs(out.astype(int) - gold.astype(int)).max() <= 1


def test_u8_ragged(anime):
    u8 = np.random.default_rng(0).integers(0, 256, (37, 61, 3), np.uint8)
    out = tiled_sr(anime, u8, 3, tile=16, chunk=5)
    assert out.shape == (111, 183, 3) and out.dtype == np.uint8

"""Overlap-tile inference must be bit-identical to whole-image inference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import load_builtin, sr_apply
from rusty_sr_tpu.parallel.tiling import tiled_sr, HALO
from rusty_sr_tpu.utils.imageio import load_image


@pytest.fixture(scope="module")
def anime_params():
    return jax.tree.map(jnp.asarray, load_builtin("anime"))


@pytest.fixture(scope="module")
def cartoon():
    return load_image("/root/reference/docs/cartoon_lr.png")  # 120x84


def _whole(params, img):
    return np.asarray(jax.jit(lambda p, x: sr_apply(p, x, 3))(
        params, jnp.asarray(img)[None])[0])


def test_tiled_equals_whole_multi_tile(anime_params, cartoon):
    want = _whole(anime_params, cartoon)
    got = tiled_sr(anime_params, cartoon, 3, tile=50, chunk=3)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_tiled_equals_whole_single_tile(anime_params, cartoon):
    want = _whole(anime_params, cartoon)
    got = tiled_sr(anime_params, cartoon, 3, tile=128, chunk=4)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_tiled_ragged_edges(anime_params):
    """Image size not divisible by tile: padded edge tiles crop correctly."""
    rng = np.random.default_rng(7)
    img = rng.random((37, 61, 3), dtype=np.float32)
    want = _whole(anime_params, img)
    got = tiled_sr(anime_params, img, 3, tile=16, chunk=5)
    assert got.shape == (111, 183, 3)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_batch_matches_single_image(anime_params, cartoon):
    """tiled_sr_batch: chunks spanning image boundaries scatter correctly
    and match per-image tiled_sr exactly (f32 and u8 paths)."""
    from rusty_sr_tpu.parallel.tiling import tiled_sr_batch
    rng = np.random.default_rng(3)
    imgs = [cartoon, rng.random((37, 61, 3), dtype=np.float32),
            rng.random((17, 23, 3), dtype=np.float32)]
    # chunk=5 does not divide any per-image tile count at tile=30
    outs = tiled_sr_batch(anime_params, imgs, 3, tile=30, chunk=5)
    for img, got in zip(imgs, outs):
        want = tiled_sr(anime_params, img, 3, tile=30, chunk=5)
        np.testing.assert_array_equal(got, want)
    # u8 end-to-end
    imgs_u8 = [(im * 255).astype(np.uint8) for im in imgs]
    outs_u8 = tiled_sr_batch(anime_params, imgs_u8, 3, tile=30, chunk=5)
    for img, got in zip(imgs_u8, outs_u8):
        want = tiled_sr(anime_params, img, 3, tile=30, chunk=5)
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, want)


def test_halo_is_receptive_field_radius():
    """Impulse test: trunk receptive field must not exceed HALO LR px."""
    params = jax.tree.map(jnp.asarray, load_builtin("anime"))
    n = 2 * HALO + 5
    a = np.zeros((n, n, 3), np.float32)
    b = a.copy()
    b[n // 2, n // 2] = 1.0  # perturb the centre
    fa = _whole(params, a)
    fb = _whole(params, b)
    diff = np.abs(fa - fb).max(axis=-1)
    ys, xs = np.nonzero(diff > 1e-7)
    # all changed HR pixels lie within HALO LR px (=3*HALO+2 HR px) of centre
    c = 3 * (n // 2) + 1
    assert np.abs(ys - c).max() <= 3 * HALO + 2
    assert np.abs(xs - c).max() <= 3 * HALO + 2

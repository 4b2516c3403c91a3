"""Fused Pallas trunk kernel vs the reference composition (interpret mode).

On CPU the kernel runs through the Pallas interpreter — same program, no
Mosaic compile — so these tests pin the kernel's math, masking, and halo
bookkeeping against sr_apply exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.models.sr_net import sr_apply
from rusty_sr_tpu.ops.pallas.trunk import fused_trunk, pack_trunk_weights, HALO
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import upsample_bilinear

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def anime():
    return {k: jnp.asarray(v) for k, v in load_builtin("anime").items()}


def _residual_ref(params, img):
    """Full-image residual = sr_apply - bilinear base."""
    full = jax.jit(lambda p, x: sr_apply(p, x, 3))(params, jnp.asarray(img))
    return np.asarray(full - upsample_bilinear(jnp.asarray(img), 3))


def _residual_fused(params, img, rh):
    h = HALO
    packed = pack_trunk_weights(params, 3, dtype=jnp.float32)
    xpad = np.pad(img, ((0, 0), (h, h), (h, h), (0, 0)))
    mask = np.pad(np.ones(img.shape[:3] + (1,), np.float32),
                  ((0, 0), (h, h), (h, h), (0, 0)))
    exp = fused_trunk(packed, jnp.asarray(xpad), jnp.asarray(mask), 3,
                      rh=rh, compute_dtype=jnp.float32, interpret=True)
    return np.asarray(depth_to_space(exp, 3))


@pytest.mark.parametrize("rh", [8, 16])
def test_fused_trunk_matches_reference(anime, rh):
    img = RNG.random((2, 32, 32, 3), dtype=np.float32)
    np.testing.assert_allclose(_residual_fused(anime, img, rh),
                               _residual_ref(anime, img), atol=3e-6)


def test_fused_trunk_border_mask_semantics(anime):
    """Border zero-pad must match full-image Same-pad at every layer —
    the mask path, not just interior correctness."""
    img = RNG.random((1, 16, 16, 3), dtype=np.float32)
    np.testing.assert_allclose(_residual_fused(anime, img, 16),
                               _residual_ref(anime, img), atol=3e-6)


def test_tiled_sr_fused_engine_matches_whole(anime):
    from rusty_sr_tpu.parallel.tiling import tiled_sr
    from rusty_sr_tpu.utils.imageio import load_image
    img = load_image("/root/reference/docs/cartoon_lr.png")[:48, :64]
    want = np.asarray(jax.jit(lambda p, x: sr_apply(p, x, 3))(
        anime, jnp.asarray(img)[None])[0])
    # fused_trunk auto-interprets on the CPU backend
    got = tiled_sr(anime, img, 3, tile=16, chunk=4, engine="fused",
                   compute_dtype=jnp.float32, rh=8,
                   packed=pack_trunk_weights(anime, 3, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=3e-6)

"""Factor generality: the reference hardcodes 3 (src/main.rs:31, TODO at
:30); this framework generalises factor across init, forward, tiling, and
training (BASELINE.json configs include 2x and 4x)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import params as P
from rusty_sr_tpu.models.sr_net import sr_apply, bilinear_apply, downsample_apply
from rusty_sr_tpu.parallel.tiling import tiled_sr
from rusty_sr_tpu.train.loop import TrainConfig, make_train_step

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("f", [2, 4])
def test_forward_shapes_and_param_count(f):
    tree = jax.tree.map(jnp.asarray, P.init_params(0, f))
    assert P.pytree_to_flat(jax.tree.map(np.asarray, tree), f).size == \
        P.num_params(f)
    x = jnp.asarray(RNG.random((1, 12, 10, 3), dtype=np.float32))
    out = jax.jit(lambda p, b: sr_apply(p, b, f))(tree, x)
    assert out.shape == (1, 12 * f, 10 * f, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("f", [2, 4])
def test_bilinear_downsample_roundtrip_shapes(f):
    x = jnp.asarray(RNG.random((1, 8 * f, 6 * f, 3), dtype=np.float32))
    up = bilinear_apply(x, f)
    assert up.shape == (1, 8 * f * f, 6 * f * f, 3)
    down = downsample_apply(x, f)
    assert down.shape == (1, 8, 6, 3)


@pytest.mark.parametrize("f", [2, 4])
def test_tiled_matches_whole(f):
    tree = jax.tree.map(jnp.asarray, P.init_params(3, f))
    img = RNG.random((21, 33, 3), dtype=np.float32)
    want = np.asarray(jax.jit(lambda p, b: sr_apply(p, b, f))(
        tree, jnp.asarray(img)[None])[0])
    got = tiled_sr(tree, img, f, tile=16, chunk=3)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_train_step_factor2():
    cfg = TrainConfig(factor=2, crop=24, batch_size=2)
    tree = jax.tree.map(jnp.asarray, P.init_params(0, 2))
    step, opt = make_train_step(cfg)
    st = opt.init(tree)
    hr = jnp.asarray(RNG.random((2, 24, 24, 3), dtype=np.float32))
    tree, st, loss, mse = step(tree, st, hr)
    assert np.isfinite(float(loss))


def test_fused_trunk_factor2_interpret():
    from rusty_sr_tpu.ops.pallas.trunk import fused_trunk, pack_trunk_weights, HALO
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
    from rusty_sr_tpu.ops.resize import upsample_bilinear
    f = 2
    tree = jax.tree.map(jnp.asarray, P.init_params(7, f))
    img = RNG.random((1, 16, 16, 3), dtype=np.float32)
    h = HALO
    xpad = np.pad(img, ((0, 0), (h, h), (h, h), (0, 0)))
    mask = np.pad(np.ones((1, 16, 16, 1), np.float32),
                  ((0, 0), (h, h), (h, h), (0, 0)))
    packed = pack_trunk_weights(tree, f, dtype=jnp.float32)
    exp = fused_trunk(packed, jnp.asarray(xpad), jnp.asarray(mask), f,
                      rh=8, compute_dtype=jnp.float32, interpret=True)
    got = np.asarray(depth_to_space(exp, f))
    full = jax.jit(lambda p, b: sr_apply(p, b, f))(tree, jnp.asarray(img))
    want = np.asarray(full - upsample_bilinear(jnp.asarray(img), f))
    np.testing.assert_allclose(got, want, atol=3e-6)


@pytest.mark.parametrize("f", [2, 4])
def test_fast_u8_tier_factor_generic(f):
    """The u8 fast tier (s2d conv0 + bf16 trunk + out16) is factor-
    generic: right shapes, and within the bf16-tier class of the exact
    u8 path for factors other than the reference's 3."""
    tree = jax.tree.map(jnp.asarray, P.init_params(5, f))
    img = RNG.integers(0, 256, (40, 34, 3), dtype=np.uint8)
    exact = tiled_sr(tree, img, f, tile=16, chunk=4)
    fast = tiled_sr(tree, img, f, tile=16, chunk=4,
                    compute_dtype=jnp.bfloat16)
    assert fast.shape == (40 * f, 34 * f, 3) and fast.dtype == np.uint8
    mse = np.mean((fast / 255.0 - exact / 255.0) ** 2)
    db = -10 * np.log10(max(mse, 1e-300))
    assert db >= 40.0, f"factor {f}: fast tier {db:.1f} dB vs exact"

"""Unit tests for every op against the SURVEY.md §8 closed-form spec."""

import numpy as np
import jax.numpy as jnp
import pytest

from rusty_sr_tpu.ops import (
    belu, srgb_to_linear, linear_to_srgb, conv2d_same,
    depth_to_space, space_to_depth, upsample_bilinear, avg_pool,
)

RNG = np.random.default_rng(42)


class TestBelu:
    def test_closed_form(self):
        x = jnp.asarray(RNG.normal(size=(2, 4, 4, 8)).astype(np.float32))
        p = jnp.asarray(RNG.normal(size=(8,)).astype(np.float32))
        got = belu(x, p)
        want = p * x + np.sqrt(np.asarray(x) ** 2 + 1) - 1
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_zero_fixed_point(self):
        # f(0) = 0 for any p
        p = jnp.asarray([0.3, -1.0, 2.0])
        np.testing.assert_allclose(belu(jnp.zeros((1, 1, 1, 3)), p), 0.0, atol=1e-7)


class TestSrgb:
    def test_round_trip(self):
        s = jnp.linspace(0.0, 1.0, 1001)
        np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(s)), s, atol=1e-5)

    def test_piecewise_knots(self):
        # Exact spec values (SURVEY.md §8.7)
        np.testing.assert_allclose(srgb_to_linear(jnp.asarray(0.04045)),
                                   0.04045 / 12.92, rtol=1e-6)
        np.testing.assert_allclose(srgb_to_linear(jnp.asarray(1.0)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(linear_to_srgb(jnp.asarray(0.0031308)),
                                   12.92 * 0.0031308, rtol=1e-5)

    def test_black_white_fixed(self):
        np.testing.assert_allclose(srgb_to_linear(jnp.asarray([0.0, 1.0])),
                                   [0.0, 1.0], atol=1e-7)


class TestConv:
    def test_cross_correlation_impulse(self):
        """Cross-correlation's impulse response is the *flipped* kernel
        (true convolution would reproduce it unflipped) — §8.3 says the op
        is cross-correlation, no kernel flip."""
        x = np.zeros((1, 7, 7, 1), np.float32)
        x[0, 3, 3, 0] = 1.0
        w = RNG.normal(size=(3, 3, 1, 1)).astype(np.float32)
        out = np.asarray(conv2d_same(jnp.asarray(x), jnp.asarray(w)))
        np.testing.assert_allclose(out[0, 2:5, 2:5, 0], w[::-1, ::-1, 0, 0],
                                   rtol=1e-5)

    def test_same_zero_padding(self):
        """A constant image convolved with a ones-kernel shows the zero-pad
        deficit at borders."""
        x = np.ones((1, 5, 5, 1), np.float32)
        w = np.ones((3, 3, 1, 1), np.float32)
        out = np.asarray(conv2d_same(jnp.asarray(x), jnp.asarray(w)))[0, :, :, 0]
        assert out[2, 2] == pytest.approx(9.0)
        assert out[0, 0] == pytest.approx(4.0)   # corner: 2x2 valid taps
        assert out[0, 2] == pytest.approx(6.0)   # edge: 2x3 valid taps

    def test_matches_f64_direct(self):
        x = RNG.normal(size=(1, 9, 11, 3)).astype(np.float32)
        w = RNG.normal(size=(5, 5, 3, 7)).astype(np.float32)
        out = np.asarray(conv2d_same(jnp.asarray(x), jnp.asarray(w)))
        # brute-force f64 reference
        xp = np.pad(x.astype(np.float64), ((0, 0), (2, 2), (2, 2), (0, 0)))
        want = np.zeros((1, 9, 11, 7))
        for dy in range(5):
            for dx in range(5):
                want += np.einsum("nhwc,co->nhwo",
                                  xp[:, dy:dy + 9, dx:dx + 11, :],
                                  w[dy, dx].astype(np.float64))
        np.testing.assert_allclose(out, want, atol=1e-4)


class TestDepthToSpace:
    def test_reference_order(self):
        """out[f*y+fy, f*x+fx, c] = in[y, x, (fy*f+fx)*C + c] (§8.6)."""
        f, C, H, W = 3, 3, 2, 2
        x = np.arange(H * W * f * f * C, dtype=np.float32).reshape(1, H, W, f * f * C)
        out = np.asarray(depth_to_space(jnp.asarray(x), f))
        for y in range(H):
            for xx in range(W):
                for fy in range(f):
                    for fx in range(f):
                        for c in range(C):
                            assert out[0, f * y + fy, f * xx + fx, c] == \
                                x[0, y, xx, (fy * f + fx) * C + c]

    def test_roundtrip(self):
        x = RNG.normal(size=(2, 4, 5, 27)).astype(np.float32)
        assert np.array_equal(
            np.asarray(space_to_depth(depth_to_space(jnp.asarray(x), 3), 3)), x)


class TestBilinear:
    def test_half_pixel_interior(self):
        """Output i samples (i+0.5)/f - 0.5 (§8.5): for f=3 on a ramp, the
        interior outputs land exactly on the interpolated ramp values."""
        n = 8
        x = np.arange(n, dtype=np.float32).reshape(1, n, 1, 1)
        out = np.asarray(upsample_bilinear(jnp.asarray(x), 3))[0, :, 0, 0]
        src = (np.arange(3 * n) + 0.5) / 3 - 0.5
        want = np.clip(src, 0, n - 1)  # a ramp interpolates to itself; clamp edges
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_edge_clamp(self):
        x = np.asarray([[5.0, 7.0]], np.float32).reshape(1, 1, 2, 1)
        out = np.asarray(upsample_bilinear(jnp.asarray(x), 3))[0, 0, :, 0]
        # first output samples src=-1/3 -> clamped to x[0]; last to x[-1]
        assert out[0] == pytest.approx(5.0)
        assert out[-1] == pytest.approx(7.0)

    def test_constant_preserved(self):
        x = np.full((1, 5, 4, 3), 0.37, np.float32)
        out = np.asarray(upsample_bilinear(jnp.asarray(x), 4))
        np.testing.assert_allclose(out, 0.37, atol=1e-6)

    def test_factor2_exact_values(self):
        x = np.asarray([0.0, 1.0], np.float32).reshape(1, 2, 1, 1)
        out = np.asarray(upsample_bilinear(jnp.asarray(x), 2))[0, :, 0, 0]
        np.testing.assert_allclose(out, [0.0, 0.25, 0.75, 1.0], atol=1e-6)


class TestAvgPool:
    def test_mean(self):
        x = RNG.normal(size=(1, 6, 9, 3)).astype(np.float32)
        out = np.asarray(avg_pool(jnp.asarray(x), 3))
        want = x.reshape(1, 2, 3, 3, 3, 3).mean(axis=(2, 4))
        np.testing.assert_allclose(out, want, rtol=2e-5, atol=1e-6)


class TestBilinearPhases:
    def test_phases_equal_upsample(self):
        """depth_to_space(bilinear_phases(x,f), f) == upsample_bilinear."""
        from rusty_sr_tpu.ops.resize import bilinear_phases
        from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
        x = RNG.random((2, 9, 11, 3)).astype(np.float32)
        for f in (2, 3):
            a = np.asarray(depth_to_space(bilinear_phases(jnp.asarray(x), f), f))
            b = np.asarray(upsample_bilinear(jnp.asarray(x), f))
            np.testing.assert_array_equal(a, b)

    def test_cropped_phases_bit_identical(self):
        """The channels-outer pre-cropped form must be BIT-identical to
        crop-after-compute (same FMAs per element, different layout) —
        both in the interior (fast path) and at clamped crops (fallback)."""
        from rusty_sr_tpu.ops.resize import (bilinear_phases,
                                             bilinear_phases_cropped)
        x = jnp.asarray(RNG.random((2, 20, 22, 3)).astype(np.float32))
        for f in (2, 3, 4):
            full = np.asarray(bilinear_phases(x, f))
            for (y0, x0, size) in [(7, 7, 6), (1, 1, 18), (0, 3, 5),
                                   (3, 0, 5), (5, 5, 15)]:
                got = np.asarray(bilinear_phases_cropped(x, f, y0, x0, size))
                np.testing.assert_array_equal(
                    got, full[:, y0:y0 + size, x0:x0 + size, :],
                    err_msg=f"f={f} crop=({y0},{x0},{size})")


class TestBf16Split:
    def test_split_reconstructs_and_hi_is_exact_bf16(self):
        from rusty_sr_tpu.ops.conv import bf16_split
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
        hi, lo = bf16_split(v)
        assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
        # hi is exactly representable (round-trip through bf16 is lossless)
        np.testing.assert_array_equal(np.asarray(hi.astype(jnp.float32)),
                                      np.asarray(hi))
        # v == hi + lo to the bf16-pair precision: lo carries the 16-bit
        # truncation residual and rounds it to 8 bits -> error <= 2^-17|v|
        recon = (np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
        err = np.abs(recon - np.asarray(v, np.float64))
        assert err.max() <= 2.0 ** -16 * np.abs(np.asarray(v)).max()

    def test_residual_survives_jit(self):
        """The reason bf16_split exists: XLA's allow-excess-precision
        rewrite folds `v - v.astype(bf16).astype(f32)` to zero inside
        jit (upcast(downcast(v)) -> v), silently collapsing two-term
        splits to a single bf16 rounding.  The masked split must keep a
        nonzero residual under jit."""
        import jax
        from rusty_sr_tpu.ops.conv import bf16_split

        @jax.jit
        def lo_mag(v):
            hi, lo = bf16_split(v)
            return jnp.mean(jnp.abs(lo.astype(jnp.float32)))

        rng = np.random.default_rng(1)
        v = jnp.asarray((rng.integers(0, 256, (64, 64)) / 255.0)
                        .astype(np.float32))
        assert float(lo_mag(v)) > 1e-4


class TestBf16SplitRN:
    def test_hi_is_round_to_nearest(self):
        import jax
        """hi must equal the round-to-nearest bf16 cast (the integer
        +0x7FFF+tie trick): truncation doubled |lo| and with it both
        dropped-cross-term and lo-rounding errors of the split conv."""
        from rusty_sr_tpu.ops.conv import bf16_split
        rng = np.random.default_rng(5)
        v = jnp.asarray((rng.standard_normal(50000)
                         * np.exp(rng.uniform(-18, 6, 50000))
                         ).astype(np.float32))
        hi, lo = jax.jit(bf16_split)(v)
        np.testing.assert_array_equal(
            np.asarray(hi.astype(jnp.float32)),
            np.asarray(v.astype(jnp.bfloat16).astype(jnp.float32)))
        rel = np.abs(np.asarray(lo, np.float32)) / np.maximum(
            np.abs(np.asarray(v)), 1e-30)
        assert rel.max() <= 2.0 ** -8  # RN bound (truncation hit 2^-7)


def test_sr_apply_fused_grad_under_defaults():
    """jax.grad over sr_apply_fused with DEFAULT arguments (compute_dtype
    set, conv0_split=True) must work: conv_split_precise carries a custom
    VJP (plain bf16-cast conv gradient) instead of surfacing a cryptic
    conv dtype error from the raw bit-ops."""
    import jax
    from rusty_sr_tpu.models.sr_net import merge_params, sr_apply_fused
    from rusty_sr_tpu import params as P
    mp = merge_params(jax.tree.map(jnp.asarray, P.init_params(0, 3)))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 12, 12, 3)).astype(np.float32))

    def loss(p):
        return jnp.mean(sr_apply_fused(p, x, 3,
                                       compute_dtype=jnp.bfloat16) ** 2)

    import jax
    g = jax.jit(jax.grad(loss))(mp)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(t, np.float32)).all() for t in flat)
    assert any(np.abs(np.asarray(t, np.float32)).max() > 0 for t in flat)

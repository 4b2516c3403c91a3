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


def test_batch_packed_tier_matches_single_image(anime_params, cartoon):
    """tiled_sr_batch on the PACKED fast tier (u8 + compute_dtype + even
    padded side — the path that derives zero tiles on device) must match
    per-image tiled_sr exactly, including ragged-edge images whose border
    tiles exercise the edge*mask derivation."""
    from rusty_sr_tpu.parallel.tiling import tiled_sr_batch
    rng = np.random.default_rng(3)
    imgs = [(np.asarray(cartoon) * 255).round().astype(np.uint8),
            (rng.random((37, 61, 3)) * 255).astype(np.uint8),
            (rng.random((17, 23, 3)) * 255).astype(np.uint8)]
    outs = tiled_sr_batch(anime_params, imgs, 3, tile=30, chunk=5,
                          compute_dtype=jnp.bfloat16)
    for img, got in zip(imgs, outs):
        want = tiled_sr(anime_params, img, 3, tile=30, chunk=5,
                        compute_dtype=jnp.bfloat16)
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


def test_conv0_s2d_weights_exact():
    """The space-to-depth conv0 lowering is a pure re-indexing: packed
    3x3 conv on 2x2-packed input == Same 5x5 conv, for any weights."""
    from rusty_sr_tpu.parallel.tiling import _conv0_s2d_weights
    from rusty_sr_tpu.ops.conv import conv2d_same
    rng = np.random.default_rng(7)
    x = rng.random((2, 12, 16, 3)).astype(np.float32)
    w0 = (rng.random((5, 5, 3, 32)) - 0.5).astype(np.float32)
    ref = np.asarray(conv2d_same(jnp.asarray(x), jnp.asarray(w0)))
    w2 = _conv0_s2d_weights(jnp.asarray(w0))
    s = x.reshape(2, 6, 2, 8, 2, 3).transpose(0, 1, 3, 2, 4, 5) \
         .reshape(2, 6, 8, 12)
    o = np.asarray(conv2d_same(jnp.asarray(s), w2))
    got = o.reshape(2, 6, 8, 2, 2, 32).transpose(0, 1, 3, 2, 4, 5) \
           .reshape(2, 12, 16, 32)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fast_tier_s2d_close_to_exact(anime_params, cartoon):
    """u8 + bf16 + even tile side triggers the s2d conv0 path; it must
    stay in the bf16-tier quality class vs the exact path, and agree with
    the non-s2d bf16 path (odd tile side) to bf16-noise level."""
    from rusty_sr_tpu.utils.imageio import to_u8
    u8 = to_u8(cartoon)
    exact = tiled_sr(anime_params, u8, 3, tile=16, chunk=4)
    fast_s2d = tiled_sr(anime_params, u8, 3, tile=16, chunk=4,
                        compute_dtype=jnp.bfloat16)       # side 30: even
    fast_odd = tiled_sr(anime_params, u8, 3, tile=15, chunk=4,
                        compute_dtype=jnp.bfloat16)       # side 29: odd
    d_exact = np.abs(fast_s2d.astype(int) - exact.astype(int))
    mse = np.mean((fast_s2d / 255.0 - exact / 255.0) ** 2)
    db = -10 * np.log10(max(mse, 1e-300))
    assert db >= 45.0, f"s2d fast tier too far from exact: {db:.1f} dB"
    assert d_exact.max() <= 8
    d_paths = np.abs(fast_s2d.astype(int) - fast_odd.astype(int))
    assert d_paths.max() <= 4  # same products, reordered bf16 accumulation


def test_out16_bcd_variant_close_to_exact():
    """out16='bcd' (convA output f32, 3x3 stage outputs bf16) sits between
    out16 off and on in rounding aggressiveness; output must stay in the
    bf16-tier class of the exact u8 path."""
    import jax.numpy as jnp
    from rusty_sr_tpu import params as P
    tree = jax.tree.map(jnp.asarray, P.init_params(2, 3))
    img = np.random.default_rng(3).integers(0, 256, (40, 34, 3),
                                            dtype=np.uint8)
    exact = tiled_sr(tree, img, 3, tile=16, chunk=4)
    for o in (False, "bcd", True):
        fast = tiled_sr(tree, img, 3, tile=16, chunk=4,
                        compute_dtype=jnp.bfloat16, out16=o)
        assert fast.shape == exact.shape and fast.dtype == np.uint8
        mse = np.mean((fast / 255.0 - exact / 255.0) ** 2)
        db = -10 * np.log10(max(mse, 1e-300))
        assert db >= 40.0, f"out16={o}: {db:.1f} dB vs exact"


def test_packed_fast_tier_tiny_image_single_tile():
    """An image much smaller than one tile runs the packed fast tier as a
    single mask-heavy tile; border semantics must hold (>= 40 dB vs the
    exact tier, shape/dtype right)."""
    import jax.numpy as jnp
    from rusty_sr_tpu import params as P
    tree = jax.tree.map(jnp.asarray, P.init_params(4, 3))
    img = np.random.default_rng(9).integers(0, 256, (12, 10, 3),
                                            dtype=np.uint8)
    exact = tiled_sr(tree, img, 3, tile=64, chunk=1)
    fast = tiled_sr(tree, img, 3, tile=64, chunk=1,
                    compute_dtype=jnp.bfloat16)
    assert fast.shape == (36, 30, 3) and fast.dtype == np.uint8
    mse = np.mean((fast / 255.0 - exact / 255.0) ** 2)
    assert -10 * np.log10(max(mse, 1e-300)) >= 40.0


def test_pick_chunk_ladder_anchor_and_tile_aware():
    """The measured ladder applies at the anchor tile; other tiles scale
    by padded-tile area and stay under the per-chip HBM cliff
    (VERDICT r2 #7: a non-default tile must pick a sane chunk)."""
    from rusty_sr_tpu.parallel.tiling import (_pick_chunk, _CHUNK_T_MS,
                                              _CLIFF_B, _LADDER_TILE, HALO)
    # anchor tile: large images pick the cliff-edge chunk
    assert _pick_chunk(1000) == max(_CHUNK_T_MS)
    # exact ladder hit: n == a measured chunk picks it (one dispatch)
    assert _pick_chunk(24) == 24
    anchor_area = (_LADDER_TILE + 2 * HALO) ** 2
    for tile in (114, 484, 978):
        c = _pick_chunk(10_000, tile)
        area = (tile + 2 * HALO) ** 2
        # equivalent anchor-tile footprint never exceeds the cliff
        assert 1 <= c and c * area <= _CLIFF_B * anchor_area * 1.01, \
            (tile, c)
    # a big tile must not inherit the anchor's chunk=112
    assert _pick_chunk(10_000, 978) < 16


def test_exact_tier_keeps_conservative_chunk(monkeypatch):
    """The ladder was measured for the packed fast-tier kernel only; the
    exact f32 path must dispatch with the conservative default chunk
    (ADVICE r2 high: ladder-sized chunks overrun HBM via the flat
    kernel's im2col patches)."""
    from rusty_sr_tpu.parallel import tiling as T

    seen = {}
    real_kernel = T._tile_kernel

    def spy(params, z, e, m, *a, **k):
        seen["batch"] = z.shape[0]
        return real_kernel(params, z, e, m, *a, **k)

    monkeypatch.setattr(T, "_tile_kernel", spy)
    from rusty_sr_tpu import params as P
    tree = jax.tree.map(jnp.asarray, P.init_params(1, 3))
    img = np.random.default_rng(0).integers(0, 256, (40, 40, 3),
                                            dtype=np.uint8)
    T.tiled_sr(tree, img, 3, tile=10)          # 16 tiles, exact tier
    assert seen["batch"] <= T._DEFAULT_CHUNK


def test_output_names_disambiguate_collisions():
    from rusty_sr_tpu.cli import _output_names
    names = _output_names(["/x/a.png", "/x/a.jpg", "/x/b.jpg"])
    assert names[2] == "b.png"
    assert names[0] != names[1]
    assert all(n.endswith(".png") for n in names)


def test_phase_split_packed_matches_dense_packed(anime_params, cartoon):
    """The phase-split packed trunk (4 per-phase K=512 dots per 3x3
    stage, 1.78x MACs) computes the same products as the dense packed
    form (one K=1152 dot, 4x MACs) — only the f32 accumulation grouping
    differs, so outputs agree to <= 1 u8 code (measured: 2e-5 of pixels
    differ by exactly 1).  The ps kernels live with their probe under
    scripts/ (probe44 measured dead end; VERDICT r3 hygiene)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from probe44_ps_kernels import (_tile_kernel_packed_ps,
                                    packed_trunk_params_ps)
    from rusty_sr_tpu.parallel.tiling import (
        _gather_u8, _tile_kernel_packed, packed_trunk_params, trunk_params)
    tp = trunk_params(anime_params)
    img = (np.asarray(cartoon) * 255).round().astype(np.uint8)
    zt, et, mt = _gather_u8(img, 50, HALO, 3, 2)
    za, ea, ma = jnp.asarray(zt), jnp.asarray(et), jnp.asarray(mt)
    dense = np.asarray(_tile_kernel_packed(
        packed_trunk_params(tp, jnp.bfloat16, 3), za, ea, ma, 3, 50,
        jnp.bfloat16))
    ps = np.asarray(_tile_kernel_packed_ps(
        packed_trunk_params_ps(tp, jnp.bfloat16, 3), za, ea, ma, 3, 50,
        jnp.bfloat16))
    d = np.abs(dense.astype(np.int32) - ps.astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_tiled_simple_bilinear_matches_whole(cartoon):
    """The fixed-shape tiled bilinear path must match the whole-image
    bilinear_apply to the u8 rounding class (and keep the CLI's -p
    bilinear at zero recompiles across image sizes)."""
    from rusty_sr_tpu.models.sr_net import bilinear_apply
    from rusty_sr_tpu.parallel.tiling import tiled_simple
    from rusty_sr_tpu.utils.imageio import to_u8
    img_u8 = (np.asarray(cartoon) * 255).round().astype(np.uint8)
    got = tiled_simple(img_u8, 3, mode="bilinear", tile=50)
    whole = to_u8(np.clip(np.asarray(bilinear_apply(
        jnp.asarray(img_u8.astype(np.float32) / 255.0)[None], 3)[0]),
        0, 1))
    d = np.abs(got.astype(np.int32) - whole.astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_tiled_simple_downsample_matches_whole(cartoon):
    from rusty_sr_tpu.models.sr_net import downsample_apply
    from rusty_sr_tpu.parallel.tiling import tiled_simple
    from rusty_sr_tpu.utils.imageio import to_u8
    img_u8 = (np.asarray(cartoon) * 255).round().astype(np.uint8)
    h, w, _ = img_u8.shape
    img_u8 = img_u8[: h - h % 3, : w - w % 3]
    got = tiled_simple(img_u8, 3, mode="downsample", tile=51)
    whole = to_u8(np.clip(np.asarray(downsample_apply(
        jnp.asarray(img_u8.astype(np.float32) / 255.0)[None], 3)[0]),
        0, 1))
    d = np.abs(got.astype(np.int32) - whole.astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_two_input_packed_kernel_bit_identical(anime_params, cartoon):
    """zero_tiles=None derives the zero-padded packed tiles as
    edge_tiles * mask in packed space (the two gathers differ only
    outside the image, where the mask is 0; u8 codes times a {0,1} mask
    are exact in bf16) — the 2-input form must be BIT-identical to the
    3-input form, including mask-heavy border tiles."""
    from rusty_sr_tpu.parallel.tiling import (
        _gather_u8, _tile_kernel_packed, packed_trunk_params, trunk_params)
    pp = packed_trunk_params(trunk_params(anime_params), jnp.bfloat16, 3)
    img = (np.asarray(cartoon) * 255).round().astype(np.uint8)
    zt, et, mt = _gather_u8(img, 50, HALO, 3, 2)
    za, ea, ma = jnp.asarray(zt), jnp.asarray(et), jnp.asarray(mt)
    three = np.asarray(_tile_kernel_packed(pp, za, ea, ma, 3, 50,
                                           jnp.bfloat16))
    two = np.asarray(_tile_kernel_packed(pp, None, ea, ma, 3, 50,
                                         jnp.bfloat16))
    np.testing.assert_array_equal(three, two)


@pytest.mark.parametrize("shape", [(1, 1, 3), (1, 7, 3), (5, 1, 3)])
def test_degenerate_image_sizes(anime_params, shape):
    """1-pixel-thin and 1x1 images through both tiers: the tile machinery
    (halo pad, mask, packed edge*mask derivation, crop/scatter) must
    degrade to the whole-image forward exactly."""
    from rusty_sr_tpu.models.sr_net import sr_apply
    rng = np.random.default_rng(0)
    img = (rng.random(shape) * 255).astype(np.uint8)
    whole = np.asarray(sr_apply(
        anime_params, jnp.asarray(img.astype(np.float32) / 255.0)[None],
        3)[0])
    wq = np.clip(np.floor(np.clip(whole, 0, 1) * 255 + 0.5),
                 0, 255).astype(np.uint8)
    exact = tiled_sr(anime_params, img, 3, tile=16)
    np.testing.assert_array_equal(exact, wq)
    fast = tiled_sr(anime_params, img, 3, tile=16,
                    compute_dtype=jnp.bfloat16)
    assert fast.shape == wq.shape
    assert np.abs(fast.astype(int) - wq.astype(int)).max() <= 1


def test_geometry_fuzz_exact_tier(anime_params):
    """Seeded mini-fuzz over (H, W, tile, chunk) geometry: the u8 exact
    tier must stay within 1 code of the whole-image forward (the
    rounding-tie class the golden gate allows) at EVERY geometry —
    a 200-case offline sweep found nothing above 1 code; this pins a
    representative slice of it in-suite."""
    rng = np.random.default_rng(42)
    whole = jax.jit(lambda x: sr_apply(anime_params, x, 3))
    for _ in range(8):
        h = int(rng.integers(2, 60))
        w = int(rng.integers(2, 60))
        tile = int(rng.integers(8, 33))
        chunk = int(rng.integers(1, 7))
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        ref = np.asarray(whole(
            jnp.asarray(img.astype(np.float32) / 255.0)[None])[0])
        refq = np.clip(np.floor(np.clip(ref, 0, 1) * 255 + 0.5),
                       0, 255).astype(np.uint8)
        out = tiled_sr(anime_params, img, 3, tile=tile, chunk=chunk)
        assert out.shape == (h * 3, w * 3, 3)
        d = np.abs(out.astype(int) - refq.astype(int)).max()
        assert d <= 1, (h, w, tile, chunk, d)


def test_geometry_fuzz_packed_vs_flat_fast(anime_params):
    """Differential mini-fuzz: the PACKED s2d trunk and the flat fast
    kernel are two lowerings of the same bf16 products — they must stay
    within 1 u8 code of each other at random geometries (a 40-case
    offline sweep across factors 2/3/4 measured worst=1)."""
    rng = np.random.default_rng(17)
    for _ in range(5):
        h = int(rng.integers(3, 50))
        w = int(rng.integers(3, 50))
        tile = int(rng.integers(5, 17)) * 2   # even side => packed
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        packed = tiled_sr(anime_params, img, 3, tile=tile, chunk=4,
                          compute_dtype=jnp.bfloat16)
        flat = tiled_sr(anime_params, img, 3, tile=tile, chunk=4,
                        compute_dtype=jnp.bfloat16, trunk="flat")
        d = np.abs(packed.astype(int) - flat.astype(int)).max()
        assert d <= 1, (h, w, tile, d)


def test_on_image_done_callback(anime_params):
    """Pipelined serving contract (on_image_done / release_outputs):
    the callback fires exactly once per image, in input order, BEFORE
    the driver returns, with the same bytes the plain call returns;
    release_outputs empties the returned slots so a big folder's
    finished outputs don't accumulate on host."""
    from rusty_sr_tpu.parallel.tiling import tiled_sr_batch
    rng = np.random.default_rng(11)
    imgs = [(rng.random((h, w, 3)) * 255).astype(np.uint8)
            for h, w in ((40, 56), (9, 13), (25, 30))]
    want = tiled_sr_batch(anime_params, imgs, 3, tile=18, chunk=5)

    got: list = []
    ret = tiled_sr_batch(anime_params, imgs, 3, tile=18, chunk=5,
                         on_image_done=lambda i, out: got.append((i, out)),
                         release_outputs=True)
    assert [i for i, _ in got] == [0, 1, 2]
    assert ret == [None, None, None]
    for (_, out), w in zip(got, want):
        np.testing.assert_array_equal(out, w)

    # without release_outputs the return value keeps the arrays
    got2: list = []
    ret2 = tiled_sr_batch(anime_params, imgs, 3, tile=18, chunk=5,
                          on_image_done=lambda i, out: got2.append(i))
    assert got2 == [0, 1, 2]
    for r, w in zip(ret2, want):
        np.testing.assert_array_equal(r, w)


def test_on_image_done_exception_propagates(anime_params):
    """A failing completion callback must fail the batch loudly (a
    swallowed write error would report success on a half-written
    folder)."""
    from rusty_sr_tpu.parallel.tiling import tiled_sr_batch
    rng = np.random.default_rng(12)
    imgs = [(rng.random((20, 20, 3)) * 255).astype(np.uint8)] * 2

    def boom(i, out):
        raise OSError("disk full")

    with pytest.raises(OSError, match="disk full"):
        tiled_sr_batch(anime_params, imgs, 3, tile=18, chunk=2,
                       on_image_done=boom)


# ---- streamed (per-chunk) tile gather: VERDICT r4 #5 ----------------------

def _gather_u8_whole_image_pad(img, tile, h, ny, nx, need_zero=True):
    """Reference implementation: the pre-round-5 whole-image-pad gather.
    The ranged gather must reproduce it byte-for-byte."""
    hgt, wid, _ = img.shape
    pad = ((h, h + ny * tile - hgt), (h, h + nx * tile - wid), (0, 0))
    zero_img = np.pad(img, pad) if need_zero else None
    edge_img = np.pad(img, pad, mode="edge")
    mask_img = np.pad(np.ones((hgt, wid, 1), np.uint8), pad)
    side = tile + 2 * h
    n = ny * nx
    zt = np.empty((n, side, side, 3), np.uint8) if need_zero else None
    et = np.empty((n, side, side, 3), np.uint8)
    mt = np.empty((n, side, side, 1), np.uint8)
    k = 0
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * tile, ix * tile
            if need_zero:
                zt[k] = zero_img[y0:y0 + side, x0:x0 + side]
            et[k] = edge_img[y0:y0 + side, x0:x0 + side]
            mt[k] = mask_img[y0:y0 + side, x0:x0 + side]
            k += 1
    return zt, et, mt


def test_ranged_u8_gather_matches_whole_pad_fuzz():
    """_gather_u8_range (per-tile windows, no whole-image pad copies)
    must be bytewise identical to the whole-image-pad reference at fuzz
    geometries, for arbitrary sub-ranges and both need_zero modes."""
    from rusty_sr_tpu.parallel.tiling import _gather_u8_range
    rng = np.random.default_rng(11)
    for hgt, wid, tile, h in [(37, 61, 16, 7), (10, 10, 16, 7),
                              (1, 1, 16, 7), (50, 8, 24, 7),
                              (48, 48, 16, 3), (33, 95, 20, 7)]:
        img = rng.integers(0, 256, (hgt, wid, 3), dtype=np.uint8)
        ny = max(1, -(-hgt // tile))
        nx = max(1, -(-wid // tile))
        n = ny * nx
        for need_zero in (True, False):
            want = _gather_u8_whole_image_pad(img, tile, h, ny, nx,
                                              need_zero)
            t0 = int(rng.integers(0, n))
            t1 = int(rng.integers(t0 + 1, n + 1))
            got = _gather_u8_range(img, tile, h, nx, t0, t1, need_zero)
            if need_zero:
                np.testing.assert_array_equal(got[0], want[0][t0:t1])
            else:
                assert got[0] is None and want[0] is None
            np.testing.assert_array_equal(got[1], want[1][t0:t1])
            np.testing.assert_array_equal(got[2], want[2][t0:t1])


def test_ranged_f32_gather_matches_full_fuzz():
    """native.gather_tiles_range (C++ and numpy-fallback layouts are the
    same contract) must equal the full gather's [t0:t1] slice."""
    from rusty_sr_tpu.utils import native
    rng = np.random.default_rng(13)
    for hgt, wid, tile in [(37, 61, 16), (9, 30, 12), (1, 5, 8)]:
        img = rng.random((hgt, wid, 3), dtype=np.float32)
        ny = max(1, -(-hgt // tile))
        nx = max(1, -(-wid // tile))
        n = ny * nx
        zt, et, mt = native.gather_tiles(img, tile, HALO, ny, nx)
        t0 = int(rng.integers(0, n))
        t1 = int(rng.integers(t0 + 1, n + 1))
        z2, e2, m2 = native.gather_tiles_range(img, tile, HALO, nx, t0, t1)
        np.testing.assert_array_equal(z2, zt[t0:t1])
        np.testing.assert_array_equal(e2, et[t0:t1])
        np.testing.assert_array_equal(m2, mt[t0:t1])


def test_tiled_sr_host_memory_bounded(anime_params, monkeypatch):
    """Single-image host memory is O(output + chunk), not O(tiles): a
    large input must not materialise the ~2.3x-image-bytes tile set the
    pre-round-5 upfront gather built.  The device kernel is stubbed (the
    bound under test is the HOST gather, and CPU conv on a 24 MPix image
    would dominate the suite's runtime)."""
    import tracemalloc
    from rusty_sr_tpu.parallel import tiling

    hgt, wid, tile, chunk = 4096, 6144, 242, 8
    img = np.ones((hgt, wid, 3), np.uint8)        # 75.5 MB LR

    tf = tile * 3

    def fake_kernel(pp, z, e, m, factor, tile_, cd):
        return np.zeros((e.shape[0], tf, tf, 3), np.uint8)

    monkeypatch.setattr(tiling, "_tile_kernel_packed", fake_kernel)
    tracemalloc.start()
    tracemalloc.reset_peak()
    out = tiling.tiled_sr(anime_params, img, 3, tile=tile, chunk=chunk,
                          compute_dtype=jnp.bfloat16,
                          device_put=lambda x: x)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert out.shape == (hgt * 3, wid * 3, 3)
    out_bytes = out.nbytes                        # 679 MB HR canvas
    lr_bytes = img.nbytes
    # The pipelined driver legitimately parks up to _MAX_INFLIGHT chunks
    # of HR result tiles before draining — that term is inherent and
    # must be budgeted explicitly (at chunk=8 it is ~101 MB here, which
    # ate the old 64 MB slack to within allocator noise).  An upfront
    # gather would add >= 1.3x LR bytes (~98 MB) of edge+mask tiles ON
    # TOP of this and blow the remaining lr/2 + 32 MB ≈ 70 MB slack.
    inflight_bytes = tiling._MAX_INFLIGHT * chunk * tf * tf * 3
    budget = out_bytes + inflight_bytes + lr_bytes // 2 + (32 << 20)
    assert peak < budget, (peak, budget)

"""High-level API + edge cases (tiny images, odd sizes)."""

import numpy as np
import pytest

import rusty_sr_tpu
from rusty_sr_tpu.utils.imageio import load_image, psnr

RNG = np.random.default_rng(13)


def test_upscale_builtin_parity():
    lr = load_image("/root/reference/docs/cartoon_lr.png")
    out = rusty_sr_tpu.upscale(lr, weights="anime")
    gold = load_image("/root/reference/docs/cartoon_rsa.png")
    assert out.shape == gold.shape
    assert psnr(np.clip(out, 0, 1), gold) > 55.0


def test_upscale_param_cache_reuse(monkeypatch):
    """The second call must HIT the param cache — determinism of the two
    outputs alone cannot fail when the cache regresses to reloading the
    weights every call."""
    from rusty_sr_tpu import api as A
    from rusty_sr_tpu import params as P
    A._PARAM_CACHE.clear()
    loads = {"n": 0}
    real = P.load_builtin

    def counting(*a, **k):
        loads["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(P, "load_builtin", counting)
    monkeypatch.setattr(A.params_lib, "load_builtin", counting)
    lr = RNG.random((12, 12, 3), dtype=np.float32)
    a = rusty_sr_tpu.upscale(lr, weights="anime", tile=16)
    b = rusty_sr_tpu.upscale(lr, weights="anime", tile=16)
    np.testing.assert_array_equal(a, b)
    assert loads["n"] == 1, f"weights decoded {loads['n']}x for 2 calls"


def test_tiny_image():
    """1-pixel and 1-row images must upscale without error."""
    one = np.full((1, 1, 3), 0.5, np.float32)
    out = rusty_sr_tpu.upscale(one, weights="anime", tile=16)
    assert out.shape == (3, 3, 3)
    row = RNG.random((1, 9, 3), dtype=np.float32)
    out = rusty_sr_tpu.upscale(row, weights="anime", tile=16)
    assert out.shape == (3, 27, 3)


def test_upscale_uint8_roundtrip():
    """uint8 input rides the u8 device path and returns uint8, matching
    the f32 path after output quantisation."""
    from rusty_sr_tpu.utils.imageio import to_u8
    u8 = (RNG.random((12, 14, 3)) * 255).astype(np.uint8)
    out_u8 = rusty_sr_tpu.upscale(u8, weights="anime", tile=16)
    assert out_u8.dtype == np.uint8 and out_u8.shape == (36, 42, 3)
    out_f = rusty_sr_tpu.upscale(u8.astype(np.float32) / 255.0,
                                 weights="anime", tile=16)
    np.testing.assert_array_equal(out_u8, to_u8(out_f))


def test_upscale_rejects_out_of_range_floats():
    bad = np.full((8, 8, 3), 128.0, np.float32)  # forgot the /255
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        rusty_sr_tpu.upscale(bad, weights="anime", tile=16)


def test_upscale_rejects_nan_floats():
    # NaN compares False against both range bounds, so the guard needs an
    # explicit finiteness check to actually reject garbage input.
    bad = np.full((8, 8, 3), np.nan, np.float32)
    with pytest.raises(ValueError, match="finite"):
        rusty_sr_tpu.upscale(bad, weights="anime", tile=16)


def test_downscale_and_bilinear():
    img = RNG.random((10, 13, 3), dtype=np.float32)
    down = rusty_sr_tpu.downscale(img)       # crops to 9x12 then pools
    assert down.shape == (3, 4, 3)
    up = rusty_sr_tpu.upscale_bilinear(down, 3)
    assert up.shape == (9, 12, 3)


def test_upscale_batch_api():
    """Public batched serving entry: matches per-image upscale()
    byte-for-byte, honours the completion callback + release contract."""
    imgs = [(RNG.random((h, w, 3)) * 255).astype(np.uint8)
            for h, w in ((13, 17), (9, 25))]
    singles = [rusty_sr_tpu.upscale(im, weights="anime", tile=16)
               for im in imgs]
    batch = rusty_sr_tpu.upscale_batch(imgs, weights="anime", tile=16)
    for s, b in zip(singles, batch):
        np.testing.assert_array_equal(s, b)
    got = []
    rel = rusty_sr_tpu.upscale_batch(
        imgs, weights="anime", tile=16,
        on_image_done=lambda i, out: got.append((i, out.copy())),
        release_outputs=True)
    assert [i for i, _ in got] == [0, 1] and all(r is None for r in rel)
    for (_, out), s in zip(got, singles):
        np.testing.assert_array_equal(out, s)


def test_train_folder_api(tmp_path):
    from rusty_sr_tpu.utils.imageio import save_image
    for i in range(2):
        save_image(str(tmp_path / f"{i}.png"),
                   RNG.random((64, 64, 3)).astype(np.float32))
    ck = tmp_path / "w.rsr"
    mf = tmp_path / "m.jsonl"
    params = rusty_sr_tpu.train_folder(str(tmp_path), steps=2,
                                       param_file=str(ck),
                                       metrics_file=str(mf))
    assert ck.exists() and ck.stat().st_size == 1_043_676
    assert mf.exists() and mf.read_text().strip()
    assert rusty_sr_tpu.pytree_to_flat(params, 3).shape == (130_459,)


def test_train_folder_api_production_recipe_knobs(tmp_path):
    """The measured production recipe (trunk='packed', batch_size=32 —
    PERF.md probe50/58) is reachable from the Python API, not just the
    CLI flags."""
    import pytest
    from rusty_sr_tpu.utils.imageio import save_image
    for i in range(2):
        save_image(str(tmp_path / f"{i}.png"),
                   RNG.random((64, 64, 3)).astype(np.float32))
    params = rusty_sr_tpu.train_folder(str(tmp_path), steps=2,
                                       trunk="packed", batch_size=2,
                                       steps_per_dispatch=1)
    assert rusty_sr_tpu.pytree_to_flat(params, 3).shape == (130_459,)
    with pytest.raises(ValueError):
        rusty_sr_tpu.train_folder(str(tmp_path), steps=1, trunk="bogus")
    with pytest.raises(ValueError):
        rusty_sr_tpu.train_folder(str(tmp_path), steps=1, batch_size=0)

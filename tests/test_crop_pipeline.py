"""CropPipeline: the production training feed (decoded cache + N workers).

Pins VERDICT r3 #1's contract: batches are real crop-windows of real
files, the stream is bit-identical for any worker count, bad files skip
deterministically, and the cache budget only changes speed, not data.
"""

import numpy as np
import pytest

from rusty_sr_tpu.utils.imageio import save_image_u8


def _make_folder(tmp_path, n=6, hw=(48, 64)):
    """Images whose pixels ENCODE (file, y, x): R=file id, G=y, B=x."""
    h, w = hw
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for i in range(n):
        img = np.stack([np.full((h, w), 10 * i), yy % 256, xx % 256],
                       axis=-1).astype(np.uint8)
        save_image_u8(str(tmp_path / f"img{i}.png"), img)
    return str(tmp_path)


def _collect(pipe, n_batches):
    out = [pipe.next_batch().copy() for _ in range(n_batches)]
    pipe.close()
    return np.stack(out)


class TestCropPipeline:
    def test_batches_are_real_windows(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path)
        pipe = CropPipeline(folder, crop=(16, 16), batch_size=4, seed=1,
                            workers=4)
        ch = 16
        for _ in range(8):
            b = pipe.next_batch()
            assert b.shape == (4, ch, ch, 3) and b.dtype == np.float32
            u8 = np.round(b * 255).astype(np.int32)
            for crop in u8:
                fid, y0, x0 = crop[0, 0, 0], crop[0, 0, 1], crop[0, 0, 2]
                assert fid % 10 == 0 and 0 <= fid // 10 < 6
                # the whole crop must be one contiguous window
                yy, xx = np.meshgrid(np.arange(ch), np.arange(ch),
                                     indexing="ij")
                assert (crop[..., 0] == fid).all()
                assert (crop[..., 1] == (y0 + yy) % 256).all()
                assert (crop[..., 2] == (x0 + xx) % 256).all()
        pipe.close()

    def test_worker_count_invariance(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path)
        a = _collect(CropPipeline(folder, crop=(16, 16), batch_size=3,
                                  seed=7, workers=1), 10)
        b = _collect(CropPipeline(folder, crop=(16, 16), batch_size=3,
                                  seed=7, workers=8), 10)
        np.testing.assert_array_equal(a, b)

    def test_cache_budget_changes_speed_not_data(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path)
        a = _collect(CropPipeline(folder, crop=(16, 16), batch_size=2,
                                  seed=3, workers=4), 6)
        nocache = CropPipeline(folder, crop=(16, 16), batch_size=2,
                               seed=3, workers=4, cache_bytes=0)
        b = _collect(nocache, 6)
        np.testing.assert_array_equal(a, b)

    def test_cache_decodes_each_file_once(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path, n=3)
        pipe = CropPipeline(folder, crop=(16, 16), batch_size=4, seed=0,
                            workers=4)
        for _ in range(12):   # several epochs over 3 files
            pipe.next_batch()
        st = pipe.cache_stats()
        pipe.close()
        assert st["cached"] == 3 and st["bad"] == 0
        assert st["cache_bytes"] == 3 * 48 * 64 * 3

    def test_bad_file_skipped_deterministically(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path, n=4)
        (tmp_path / "corrupt.png").write_bytes(b"not a png")
        a = _collect(CropPipeline(folder, crop=(16, 16), batch_size=2,
                                  seed=5, workers=1), 8)
        b = _collect(CropPipeline(folder, crop=(16, 16), batch_size=2,
                                  seed=5, workers=8), 8)
        np.testing.assert_array_equal(a, b)
        # every emitted crop comes from a GOOD file
        assert (np.round(a[..., 0, 0, 0, 0] * 255).astype(int) % 10 == 0).all()

    def test_all_unreadable_raises(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        for i in range(3):
            (tmp_path / f"bad{i}.png").write_bytes(b"junk")
        pipe = CropPipeline(str(tmp_path), crop=(8, 8), batch_size=1,
                            workers=2)
        with pytest.raises(RuntimeError, match="could be decoded"):
            pipe.next_batch()
        pipe.close()

    def test_small_image_edge_padded(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        save_image_u8(str(tmp_path / "small.png"),
                      np.full((5, 5, 3), 100, np.uint8))
        pipe = CropPipeline(str(tmp_path), crop=(16, 16), batch_size=1,
                            workers=2)
        b = pipe.next_batch()
        pipe.close()
        assert b.shape == (1, 16, 16, 3)
        np.testing.assert_allclose(b, 100 / 255.0, rtol=1e-6)

    def test_rejects_zero_batch_and_empty_folder(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        with pytest.raises(ValueError, match="no images"):
            CropPipeline(str(tmp_path), batch_size=1)
        save_image_u8(str(tmp_path / "a.png"),
                      np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(ValueError, match="batch_size"):
            CropPipeline(str(tmp_path), batch_size=0)

    def test_multihost_striping(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path, n=6)
        p0 = CropPipeline(folder, crop=(16, 16), batch_size=2, seed=0,
                          workers=2, shard_across_hosts=True,
                          process_index=0, process_count=2)
        p1 = CropPipeline(folder, crop=(16, 16), batch_size=2, seed=0,
                          workers=2, shard_across_hosts=True,
                          process_index=1, process_count=2)
        f0 = {int(np.round(pix * 255)) // 10
              for b in [p0.next_batch() for _ in range(6)]
              for pix in b[:, 0, 0, 0]}
        f1 = {int(np.round(pix * 255)) // 10
              for b in [p1.next_batch() for _ in range(6)]
              for pix in b[:, 0, 0, 0]}
        p0.close(); p1.close()
        assert f0 and f1 and not (f0 & f1)   # disjoint stripes

    def test_close_never_wedges(self, tmp_path):
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path)
        pipe = CropPipeline(folder, crop=(16, 16), batch_size=2, workers=4)
        pipe.next_batch()
        pipe.close()
        for t in pipe._threads:
            t.join(timeout=5)
            assert not t.is_alive()

    def test_u8_output_dtype_bit_identical(self, tmp_path):
        """out_dtype=uint8 (the production 4x-less-H2D path) carries the
        same data: u8 * (1/255) in f32 must equal the f32 batches."""
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path)
        a = _collect(CropPipeline(folder, crop=(16, 16), batch_size=3,
                                  seed=7, workers=4), 6)
        pu = CropPipeline(folder, crop=(16, 16), batch_size=3, seed=7,
                          workers=4, out_dtype=np.uint8)
        b = np.stack([pu.next_batch().copy() for _ in range(6)])
        pu.close()
        assert b.dtype == np.uint8
        np.testing.assert_array_equal(
            a, b.astype(np.float32) * np.float32(1 / 255.0))

    def test_u8_train_step_matches_f32(self, tmp_path):
        """The device-side u8->f32 conversion in loss_fn is the same
        multiply the host would do; the two jit graphs may fuse the
        convert differently, so the match is f32-ulp class (measured
        max 7e-8 on O(0.1) params), not bitwise."""
        import jax
        import jax.numpy as jnp
        from rusty_sr_tpu import params as P
        from rusty_sr_tpu.train.loop import TrainConfig, make_train_step

        rng = np.random.default_rng(3)
        u8 = rng.integers(0, 256, (2, 24, 24, 3), np.uint8)
        f32 = u8.astype(np.float32) * np.float32(1 / 255.0)
        cfg = TrainConfig(factor=3, batch_size=2, crop=24)
        step, opt = make_train_step(cfg)
        p = jax.tree.map(jnp.asarray, P.init_params(0, 3))
        s = opt.init(p)
        pa, sa, la, ma = step(p, s, jnp.asarray(f32))
        p = jax.tree.map(jnp.asarray, P.init_params(0, 3))
        s = opt.init(p)
        pb, sb, lb, mb = step(p, s, jnp.asarray(u8))
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
        for k in pa:
            np.testing.assert_allclose(np.asarray(pa[k]),
                                       np.asarray(pb[k]), atol=1e-6,
                                       err_msg=k)

    def test_feed_rate_meets_device_appetite(self, tmp_path):
        """The engineered pipeline must actually feed the measured
        device step rate.  Warm-cache crops/s on CPU against a modest
        floor (CI machines vary); the real number is measured on the
        bench host (scripts/data_bench.py -> PERF.md)."""
        import time
        from rusty_sr_tpu.train.data import CropPipeline
        rng = np.random.default_rng(0)
        for i in range(4):
            save_image_u8(str(tmp_path / f"big{i}.png"),
                          rng.integers(0, 256, (512, 512, 3), np.uint8))
        pipe = CropPipeline(str(tmp_path), crop=(192, 192), batch_size=32,
                            workers=8)
        pipe.next_batch()                    # warm the cache
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            pipe.next_batch()
        dt = time.perf_counter() - t0
        pipe.close()
        rate = n * 32 / dt
        assert rate > 500, f"warm-cache feed rate {rate:.0f} crops/s"

    def test_bomb_file_skipped(self, tmp_path):
        """A decompression-bomb PNG (DecompressionBombError is NOT an
        OSError) is marked bad and skipped like any unreadable file —
        it must not crash the worker pool mid-training."""
        from tests.test_cli import _bomb_png_bytes
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path, n=3)
        (tmp_path / "bomb.png").write_bytes(_bomb_png_bytes())
        pipe = CropPipeline(folder, crop=(16, 16), batch_size=2, seed=3,
                            workers=4)
        for _ in range(8):
            pipe.next_batch()
        st = pipe.cache_stats()
        pipe.close()
        assert st["bad"] == 1 and st["cached"] == 3

    def test_worker_count_invariance_nondefault_crop(self, tmp_path):
        """The single-RNG crop plan is worker-invariant at ANY window
        size (plan entries carry normalized u_y/u_x — the --crop flag,
        VERDICT r4 #4, only changes the window)."""
        from rusty_sr_tpu.train.data import CropPipeline
        folder = _make_folder(tmp_path)
        a = _collect(CropPipeline(folder, crop=(28, 28), batch_size=3,
                                  seed=7, workers=1), 8)
        b = _collect(CropPipeline(folder, crop=(28, 28), batch_size=3,
                                  seed=7, workers=8), 8)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (8, 3, 28, 28, 3)

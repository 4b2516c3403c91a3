"""CLI surface tests (parsing + dispatch; execution covered by the verify
recipe and golden tests)."""

import numpy as np
import pytest

from rusty_sr_tpu import cli


def test_upscale_parser_defaults():
    p = cli.build_parser()
    a = p.parse_args(["in.png", "out.png"])
    assert a.INPUT_FILE == "in.png" and a.OUTPUT_FILE == "out.png"
    assert a.parameters is None and not a.downsample and a.factor == 3
    assert a.engine == "xla" and not a.fast


def test_upscale_parser_flags():
    p = cli.build_parser()
    a = p.parse_args(["-p", "anime", "--fast", "--engine", "fused",
                      "-f", "2", "x.png", "y.png"])
    assert a.parameters == "anime" and a.fast and a.engine == "fused"
    assert a.factor == 2


def test_parser_rejects_unknown_weights():
    p = cli.build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["-p", "vgg19", "x.png", "y.png"])


def test_train_parser():
    t = cli.build_train_parser()
    a = t.parse_args(["out.rsr", "imgs", "-l", "-r", "-s", "w.rsr",
                      "-v", "val", "-m", "8", "--loss", "l1"])
    assert a.PARAMETER_FILE == "out.rsr" and a.TRAINING_FOLDER == "imgs"
    assert a.linear_loss and a.recurse and a.start == "w.rsr"
    assert a.val_folder == "val" and a.val_max == 8 and a.loss == "l1"
    assert a.ckpt_every is None and a.val_every is None  # default: cfg 100s
    a = t.parse_args(["o.rsr", "imgs", "--ckpt_every", "50",
                      "--val_every", "25"])
    assert a.ckpt_every == 50 and a.val_every == 25


def test_train_bad_cadence_flags(capsys):
    rc = cli.main(["train", "o.rsr", "ti", "--val_every", "0"])
    assert rc == 2
    assert "--val_every must be >= 1" in capsys.readouterr().err


def test_main_dispatch_conflicting_flags(capsys):
    rc = cli.main(["-d", "-p", "anime", "a.png", "b.png"])
    assert rc == 2
    assert "conflicts" in capsys.readouterr().err


def test_main_missing_input(capsys):
    rc = cli.main(["--platform", "cpu", "/definitely/missing.png", "o.png"])
    assert rc == 1
    assert "Error opening input image file" in capsys.readouterr().err


def test_builtin_weights_wrong_factor_friendly_error(tmp_path, capsys):
    """-p imagenet -f 2: builtin weights are factor-3, must exit 1 with the
    reference's size-mismatch message, not a traceback (src/main.rs:162)."""
    from rusty_sr_tpu.utils.imageio import save_image
    src = tmp_path / "in.png"
    save_image(str(src), np.random.default_rng(0).random((6, 5, 3)).astype(np.float32))
    rc = cli.main(["--platform", "cpu", "-p", "imagenet", "-f", "2",
                   str(src), str(tmp_path / "out.png")])
    assert rc == 1
    assert "same factor" in capsys.readouterr().err


def test_error_message_parity(tmp_path, capsys):
    """Reference expect() strings (src/main.rs:134,175,191,212) map to
    clean messages + rc 1, never tracebacks."""
    from rusty_sr_tpu.utils.imageio import save_image
    src = tmp_path / "in.png"
    save_image(str(src), np.random.default_rng(0).random((6, 5, 3)).astype(np.float32))

    # missing custom parameter file
    rc = cli.main(["--platform", "cpu", "-c", "/missing.rsr",
                   str(src), str(tmp_path / "o.png")])
    assert rc == 1
    assert "Error opening parameter file" in capsys.readouterr().err

    # unwritable output file
    rc = cli.main(["--platform", "cpu", "-p", "bilinear", str(src),
                   str(tmp_path / "no_dir" / "o.png")])
    assert rc == 1
    assert "Could not write output file" in capsys.readouterr().err

    # missing --start file for train
    ti = tmp_path / "ti"
    ti.mkdir()
    save_image(str(ti / "a.png"), np.random.default_rng(1).random((30, 30, 3)).astype(np.float32))
    rc = cli.main(["train", str(tmp_path / "o.rsr"), str(ti),
                   "-s", "/missing.rsr", "--platform", "cpu"])
    assert rc == 1
    assert "Error opening start parameter file" in capsys.readouterr().err

    # unwritable PARAMETER_FILE
    rc = cli.main(["train", str(tmp_path / "no_dir" / "o.rsr"), str(ti),
                   "--max_steps", "1", "--platform", "cpu"])
    assert rc == 1
    assert "Could not make parameter file" in capsys.readouterr().err

    # undecodable training folder
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "x.png").write_bytes(b"junk")
    rc = cli.main(["train", str(tmp_path / "o2.rsr"), str(bad),
                   "--max_steps", "1", "--platform", "cpu"])
    assert rc == 1
    assert "could be decoded" in capsys.readouterr().err


def test_train_mesh_smoke(tmp_path):
    """CLI --mesh: DP training over the virtual device mesh end to end,
    including a validation pass through the fixed-shape tiled path."""
    from rusty_sr_tpu.utils.imageio import save_image
    rng = np.random.default_rng(11)
    ti = tmp_path / "ti"
    ti.mkdir()
    for i in range(3):
        save_image(str(ti / f"t{i}.png"), rng.random((200, 200, 3)).astype(np.float32))
    out = tmp_path / "out.rsr"
    rc = cli.main(["train", str(out), str(ti), "-v", str(ti), "-m", "1",
                   "--mesh", "data=2", "--batch", "4", "--max_steps", "1"])
    assert rc == 0
    assert out.stat().st_size == 1_043_676


def test_train_mesh_bad_spec(capsys):
    rc = cli.main(["train", "o.rsr", "ti", "--mesh", "data=2,bogus=3"])
    assert rc == 2
    assert "bad --mesh" in capsys.readouterr().err


def test_folder_mode_batches_images(tmp_path, capsys):
    """INPUT as folder: every image lands in OUTPUT folder, matching the
    single-image CLI path byte-for-byte."""
    from rusty_sr_tpu.utils.imageio import save_image, load_image_u8
    rng = np.random.default_rng(5)
    src = tmp_path / "in"
    src.mkdir()
    for i, shape in enumerate([(20, 15, 3), (9, 31, 3)]):
        save_image(str(src / f"im{i}.png"), rng.random(shape).astype(np.float32))
    dst = tmp_path / "out"
    rc = cli.main(["--platform", "cpu", "-p", "anime", "--tile", "16",
                   str(src), str(dst)])
    assert rc == 0
    for i in range(2):
        single = tmp_path / f"single{i}.png"
        rc = cli.main(["-p", "anime", "--tile", "16",
                       str(src / f"im{i}.png"), str(single)])
        assert rc == 0
        np.testing.assert_array_equal(load_image_u8(str(dst / f"im{i}.png")),
                                      load_image_u8(str(single)))


def test_end_to_end_bilinear(tmp_path):
    """Cheapest full CLI path: bilinear mode on a tiny image."""
    from rusty_sr_tpu.utils.imageio import save_image, load_image
    src = tmp_path / "in.png"
    dst = tmp_path / "out.png"
    save_image(str(src), np.random.default_rng(0).random((6, 5, 3)).astype(np.float32))
    rc = cli.main(["--platform", "cpu", "-p", "bilinear",
                   str(src), str(dst)])
    assert rc == 0
    assert load_image(str(dst)).shape == (18, 15, 3)


def test_upscale_mesh_matches_unsharded(tmp_path):
    """`--mesh data=4` output must byte-match the unsharded run; a bad
    mesh spec and a non-xla engine with --mesh both exit 2."""
    import jax
    import numpy as np
    from rusty_sr_tpu import cli
    from rusty_sr_tpu.utils.imageio import load_image_u8, save_image_u8
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs 4 virtual devices")
    src = "/root/reference/docs/cartoon_lr.png"
    img = load_image_u8(src)[:40, :48]
    small = str(tmp_path / "in.png")
    save_image_u8(small, img)
    a, b = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    assert cli.main(["--platform", "cpu", "-p", "anime", "--tile", "16",
                     small, a]) == 0
    assert cli.main(["--platform", "cpu", "-p", "anime", "--tile", "16",
                     "--mesh", "data=4", small, b]) == 0
    np.testing.assert_array_equal(load_image_u8(a), load_image_u8(b))
    assert cli.main(["--platform", "cpu", "-p", "anime", "--mesh", "bogus=2",
                     small, b]) == 2
    assert cli.main(["--platform", "cpu", "-p", "anime", "--mesh", "2",
                     "--engine", "fused", small, b]) == 2


def test_watch_once_serves_folder(tmp_path, capsys):
    """`watch --once` (serving mode): processes current folder contents,
    matches the plain upscale path byte-for-byte, skips junk files."""
    from rusty_sr_tpu.utils.imageio import save_image, load_image_u8
    rng = np.random.default_rng(7)
    src = tmp_path / "in"
    src.mkdir()
    save_image(str(src / "a.png"), rng.random((12, 10, 3)).astype(np.float32))
    (src / "junk.png").write_bytes(b"not a png")
    dst = tmp_path / "out"
    rc = cli.main(["watch", "--platform", "cpu", "-p", "anime",
                   "--tile", "16", "--once", str(src), str(dst)])
    assert rc == 0
    single = tmp_path / "single.png"
    assert cli.main(["-p", "anime", "--tile", "16",
                     str(src / "a.png"), str(single)]) == 0
    np.testing.assert_array_equal(load_image_u8(str(dst / "a.png")),
                                  load_image_u8(str(single)))
    assert not (dst / "junk.png").exists()


def test_watch_once_group_split_bounded_memory(tmp_path, monkeypatch):
    """The watcher decodes per LR-byte-bounded group (a huge pre-filled
    folder must not decode whole into host memory before the first
    device pass): with a budget that forces one image per group, every
    image is still served, byte-identical to the single-group run."""
    from rusty_sr_tpu.utils.imageio import save_image, load_image_u8
    rng = np.random.default_rng(9)
    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        save_image(str(src / f"i{i}.png"),
                   rng.random((11 + i, 9, 3)).astype(np.float32))
    ref = tmp_path / "ref"
    assert cli.main(["watch", "--platform", "cpu", "-p", "anime",
                     "--tile", "16", "--once", str(src), str(ref)]) == 0
    monkeypatch.setattr(cli, "_GROUP_LR_BYTES", 1)  # 1 image per group
    dst = tmp_path / "out"
    assert cli.main(["watch", "--platform", "cpu", "-p", "anime",
                     "--tile", "16", "--once", str(src), str(dst)]) == 0
    for i in range(3):
        np.testing.assert_array_equal(
            load_image_u8(str(dst / f"i{i}.png")),
            load_image_u8(str(ref / f"i{i}.png")))


def test_watch_bad_input_dir(capsys):
    rc = cli.main(["watch", "--platform", "cpu", "/nonexistent_dir_xyz", "o"])
    assert rc == 1
    assert "not a folder" in capsys.readouterr().err


def test_train_mesh_tp_smoke(tmp_path):
    """CLI --mesh with a 'model' axis: dp x tp training end to end."""
    from rusty_sr_tpu.utils.imageio import save_image
    ti = tmp_path / "ti"
    ti.mkdir()
    rng = np.random.default_rng(11)
    for i in range(2):
        save_image(str(ti / f"t{i}.png"),
                   rng.random((200, 200, 3)).astype(np.float32))
    out = tmp_path / "o.rsr"
    rc = cli.main(["train", str(out), str(ti), "--platform", "cpu",
                   "--mesh", "data=2,model=2", "--batch", "4",
                   "--max_steps", "1"])
    assert rc == 0
    assert out.stat().st_size == 1_043_676


def test_resume_flag_parsing_and_errors(capsys):
    t = cli.build_train_parser()
    assert t.parse_args(["o.rsr", "ti"]).resume is None
    assert t.parse_args(["o.rsr", "ti", "--resume"]).resume == ""
    assert t.parse_args(["o.rsr", "ti", "--resume", "d"]).resume == "d"
    # bare --resume needs --ckpt_dir to know where to look
    rc = cli.main(["train", "o.rsr", "ti", "--resume"])
    assert rc == 2
    assert "--ckpt_dir" in capsys.readouterr().err
    # --resume already restores params: -s/--start conflicts
    rc = cli.main(["train", "o.rsr", "ti", "--resume", "d", "-s", "w.rsr"])
    assert rc == 2
    assert "conflicts" in capsys.readouterr().err


def test_cli_train_resume_end_to_end(tmp_path, capsys):
    """`train --ckpt_dir D --resume`: a second invocation picks up the
    latest native checkpoint (params + Adam state + step) and continues
    the budget from there (VERDICT r2 #2)."""
    from rusty_sr_tpu.utils.imageio import save_image
    rng = np.random.default_rng(13)
    ti = tmp_path / "ti"
    ti.mkdir()
    for i in range(2):
        save_image(str(ti / f"t{i}.png"),
                   rng.random((200, 200, 3)).astype(np.float32))
    out, ck_dir = tmp_path / "out.rsr", tmp_path / "ck"
    rc = cli.main(["train", str(out), str(ti), "--max_steps", "2",
                   "--ckpt_dir", str(ck_dir)])
    assert rc == 0
    from rusty_sr_tpu.train import checkpoint as ckpt
    assert ckpt.latest_native(str(ck_dir)).endswith("step_00000002")
    rc = cli.main(["train", str(out), str(ti), "--max_steps", "4",
                   "--ckpt_dir", str(ck_dir), "--resume"])
    assert rc == 0
    assert "Resumed from" in capsys.readouterr().out
    assert ckpt.latest_native(str(ck_dir)).endswith("step_00000004")


def test_folder_mode_engine_surface(tmp_path):
    """--engine int8 is retired from every CLI surface (VERDICT r4 #3,
    PERF.md probe59): argparse rejects it outright; folder mode keeps the
    clean error for the remaining non-xla engine (fused is
    single-image/f32 only)."""
    from rusty_sr_tpu.utils.imageio import save_image
    import pytest
    rng = np.random.default_rng(7)
    ti = tmp_path / "in"
    ti.mkdir()
    save_image(str(ti / "a.png"), rng.random((20, 24, 3)).astype(np.float32))
    out = tmp_path / "out"
    with pytest.raises(SystemExit) as ei:
        cli.main(["--engine", "int8", "-p", "anime", "--tile", "16",
                  str(ti), str(out)])
    assert ei.value.code == 2
    rc = cli.main(["--engine", "fused", "-p", "anime", str(ti), str(out)])
    assert rc == 2  # fused is single-image/f32 only - clean error
    # watch mode has no --engine flag at all any more
    with pytest.raises(SystemExit) as ei:
        cli.main(["watch", "--engine", "int8", str(ti), str(out)])
    assert ei.value.code == 2


def test_stable_namer_cross_batch_collisions():
    """Watch mode: 'a.png' and 'a.jpg' arriving in DIFFERENT poll
    batches must not overwrite each other's output; names are stable
    per source for the namer's lifetime (re-processing keeps a name)."""
    from rusty_sr_tpu.cli import _StableNamer
    pick = _StableNamer()
    assert pick("/in/a.png") == "a.png"       # poll 1
    assert pick("/in/a.jpg") == "a.jpg.png"   # poll 2: collision dodged
    assert pick("/in/a.png") == "a.png"       # re-process: stable
    assert pick("/in/a.jpg") == "a.jpg.png"
    assert pick("/in/b.jpg") == "b.png"       # no collision: stem wins


def test_stable_namer_fallback_collision_chain():
    """The fallback name must be claim-checked too: with 'a.png',
    'a.jpg.png' and 'a.jpg' all in play, the last one's fallback
    'a.jpg.png' is already owned by the second — pre-fix it silently
    took over that name and both sources clobbered one output file."""
    from rusty_sr_tpu.cli import _StableNamer
    pick = _StableNamer()
    assert pick("/in/a.png") == "a.png"
    assert pick("/in/a.jpg.png") == "a.jpg.png"   # stem 'a.jpg' is free
    third = pick("/in/a.jpg")                      # both names taken
    assert third == "a.jpg.2.png"
    # stable on re-process, and all three remain distinct
    assert pick("/in/a.jpg") == third
    assert len({pick("/in/a.png"), pick("/in/a.jpg.png"), third}) == 3


def test_watch_retries_after_mtime_change(tmp_path):
    """A file that fails to read for 3+ polls (mid-copy) must be retried
    once its mtime changes — pre-fix the failure counter never reset and
    the resident watcher blacklisted the path forever."""
    import os
    import subprocess
    import sys as _sys
    import time as _time
    src = tmp_path / "in"
    src.mkdir()
    dst = tmp_path / "out"
    (src / "a.png").write_bytes(b"not a png yet")   # partial write
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
    logf = tmp_path / "watch.log"
    with open(logf, "w") as lf:
        proc = subprocess.Popen(
            [_sys.executable, "-m", "rusty_sr_tpu.cli", "watch",
             "--platform", "cpu", "-p", "anime", "--tile", "16",
             "--poll", "0.05", str(src), str(dst)],
            env=env, stdout=lf, stderr=subprocess.STDOUT, text=True)
    try:
        deadline = _time.time() + 180
        # wait until the watcher has actually blacklisted the partial
        # file (3 failed polls), THEN complete the write (mtime changes)
        while _time.time() < deadline and \
                "skipping" not in logf.read_text():
            _time.sleep(0.1)
        assert "skipping" in logf.read_text(), logf.read_text()
        _time.sleep(0.2)  # a couple of polls with the file blacklisted
        from rusty_sr_tpu.utils.imageio import save_image
        rng = np.random.default_rng(1)
        save_image(str(src / "a.png"),
                   rng.random((12, 10, 3)).astype(np.float32))
        while _time.time() < deadline and not (dst / "a.png").exists():
            _time.sleep(0.25)
        assert (dst / "a.png").exists(), \
            "watcher never retried the file:\n" + logf.read_text()
    finally:
        proc.send_signal(2)  # SIGINT == Ctrl-C: clean watcher shutdown
        proc.wait(timeout=60)
    assert proc.returncode == 0, logf.read_text()


def test_fast_flag_reaches_all_three_surfaces(tmp_path):
    """--fast must wire compute_dtype=bf16 through upscale, folder mode
    and watch — each surface sets it independently (cli.py), so each
    must be pinned byte-for-byte against tiled_sr's fast tier AND shown
    to differ from the exact tier (otherwise a dropped flag would pass
    every output-validity test while making the headline fast tier
    unreachable from the CLI)."""
    import os
    import jax.numpy as jnp
    from rusty_sr_tpu import load_builtin
    from rusty_sr_tpu.parallel.tiling import tiled_sr
    from rusty_sr_tpu.utils.imageio import save_image, load_image_u8
    rng = np.random.default_rng(11)
    img_f = rng.random((40, 34, 3)).astype(np.float32)
    src = tmp_path / "in.png"
    save_image(str(src), img_f)
    u8 = load_image_u8(str(src))
    import jax
    tree = jax.tree.map(jnp.asarray, load_builtin("anime"))
    want_fast = tiled_sr(tree, u8, 3, tile=16, compute_dtype=jnp.bfloat16)
    want_exact = tiled_sr(tree, u8, 3, tile=16)
    assert np.abs(want_fast.astype(int) - want_exact.astype(int)).max() > 0

    # single-image surface
    out1 = tmp_path / "o1.png"
    assert cli.main(["-p", "anime", "--tile", "16", "--fast",
                     str(src), str(out1)]) == 0
    np.testing.assert_array_equal(load_image_u8(str(out1)), want_fast)

    # folder surface
    fdir = tmp_path / "fold"
    fdir.mkdir()
    save_image(str(fdir / "a.png"), img_f)
    odir = tmp_path / "fo"
    assert cli.main(["-p", "anime", "--tile", "16", "--fast",
                     str(fdir), str(odir)]) == 0
    np.testing.assert_array_equal(load_image_u8(str(odir / "a.png")),
                                  want_fast)

    # watch surface (--once)
    wdir = tmp_path / "wo"
    assert cli.main(["watch", "-p", "anime", "--tile", "16", "--fast",
                     "--once", str(fdir), str(wdir)]) == 0
    np.testing.assert_array_equal(load_image_u8(str(wdir / "a.png")),
                                  want_fast)


def test_exact_tier_tip_on_stderr(tmp_path, capsys):
    """The exact (default) tier prints ONE stderr signpost to --fast —
    the tier that beats the north star (round-3 review weak #7); --fast
    itself must stay quiet on stderr."""
    from rusty_sr_tpu.utils.imageio import load_image_u8, save_image_u8
    img = load_image_u8("/root/reference/docs/cartoon_lr.png")[:20, :24]
    src = str(tmp_path / "in.png")
    save_image_u8(src, img)

    assert cli.main(["--platform", "cpu", "-p", "anime", "--tile", "16",
                     src, str(tmp_path / "a.png")]) == 0
    err = capsys.readouterr().err
    assert "--fast" in err and err.count("tip:") == 1

    assert cli.main(["--platform", "cpu", "-p", "anime", "--tile", "16",
                     "--fast", src, str(tmp_path / "b.png")]) == 0
    assert "tip:" not in capsys.readouterr().err


def test_folder_mode_grouped_streaming_matches(tmp_path, monkeypatch):
    """The bounded-memory group pipeline (decode-ahead groups +
    write-behind encode) must produce byte-identical outputs however
    the folder is split into device groups: force one-image groups and
    compare against the single-group run."""
    from rusty_sr_tpu.utils.imageio import save_image, load_image_u8
    rng = np.random.default_rng(9)
    src = tmp_path / "in"
    src.mkdir()
    for i, shape in enumerate([(20, 15, 3), (9, 31, 3), (17, 17, 3)]):
        save_image(str(src / f"im{i}.png"),
                   rng.random(shape).astype(np.float32))
    one = tmp_path / "one"
    assert cli.main(["--platform", "cpu", "-p", "anime", "--tile", "16",
                     str(src), str(one)]) == 0
    monkeypatch.setattr(cli, "_GROUP_LR_BYTES", 1)  # every image its own group
    many = tmp_path / "many"
    assert cli.main(["--platform", "cpu", "-p", "anime", "--tile", "16",
                     str(src), str(many)]) == 0
    for i in range(3):
        np.testing.assert_array_equal(
            load_image_u8(str(many / f"im{i}.png")),
            load_image_u8(str(one / f"im{i}.png")))


def test_folder_mode_write_failure_reports_and_continues(tmp_path, capsys):
    """A single unwritable output (here: a directory squatting on the
    output path) must be reported with exit 1 while every other image
    is still written — the write-behind pool collects failures instead
    of dying mid-batch."""
    from rusty_sr_tpu.utils.imageio import save_image
    rng = np.random.default_rng(10)
    src = tmp_path / "in"
    src.mkdir()
    for name in ("a", "b"):
        save_image(str(src / f"{name}.png"),
                   rng.random((12, 10, 3)).astype(np.float32))
    dst = tmp_path / "out"
    dst.mkdir()
    (dst / "a.png").mkdir()   # save will fail with IsADirectoryError
    rc = cli.main(["--platform", "cpu", "-p", "anime", "--tile", "16",
                   str(src), str(dst)])
    err = capsys.readouterr().err
    assert rc == 1
    assert "Could not write output file" in err and "a.png" in err
    assert (dst / "b.png").is_file()


def test_folder_mode_unreadable_only(tmp_path, capsys):
    """A folder with no decodable image exits 1 with the same
    diagnostic the eager loop used."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "junk.png").write_bytes(b"not a png")
    rc = cli.main(["--platform", "cpu", "-p", "anime",
                   str(src), str(tmp_path / "out")])
    err = capsys.readouterr().err
    assert rc == 1
    assert "no readable images" in err and "skipping" in err


def _bomb_png_bytes() -> bytes:
    """~66-byte syntactically valid PNG whose IHDR claims 4.3 gigapixels —
    the decompression-bomb shape (native decode declines past PIL's
    MAX_IMAGE_PIXELS; the PIL fallback raises DecompressionBombError,
    which is NOT an OSError)."""
    import struct
    import zlib

    def chunk(t, d):
        c = t + d
        return struct.pack(">I", len(d)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">II5B", 1 << 16, 1 << 16, 8, 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00")) + chunk(b"IEND", b""))


def test_folder_and_watch_survive_decompression_bomb(tmp_path, capsys):
    """A crafted gigapixel-header PNG in the input folder is skipped like
    any unreadable file — it must not kill the run (watch especially:
    one hostile file in a watched folder would take down the resident
    server if DecompressionBombError escaped the skip handlers)."""
    from rusty_sr_tpu.utils.imageio import save_image, load_image_u8
    rng = np.random.default_rng(11)
    src = tmp_path / "in"
    src.mkdir()
    save_image(str(src / "good.png"), rng.random((12, 10, 3)).astype(np.float32))
    (src / "bomb.png").write_bytes(_bomb_png_bytes())

    dst = tmp_path / "out"
    rc = cli.main(["--platform", "cpu", "-p", "anime", "--tile", "16",
                   str(src), str(dst)])
    err = capsys.readouterr().err
    assert rc == 0
    assert "skipping" in err and "bomb.png" in err
    assert (dst / "good.png").is_file() and not (dst / "bomb.png").exists()

    dst2 = tmp_path / "out2"
    rc = cli.main(["watch", "--platform", "cpu", "-p", "anime",
                   "--tile", "16", "--once", str(src), str(dst2)])
    assert rc == 0
    assert (dst2 / "good.png").is_file() and not (dst2 / "bomb.png").exists()
    np.testing.assert_array_equal(load_image_u8(str(dst2 / "good.png")),
                                  load_image_u8(str(dst / "good.png")))

    # single-image path: clean diagnostic, no traceback
    rc = cli.main(["--platform", "cpu", "-p", "anime",
                   str(src / "bomb.png"), str(tmp_path / "x.png")])
    assert rc == 1
    assert "Error opening input image file" in capsys.readouterr().err


def test_train_crop_flag(tmp_path, capsys):
    """--crop generalises the reference's hardcoded 192 crop
    (src/main.rs:187; VERDICT r4 #4): validation errors are clean, and a
    non-default crop trains end to end (with --remat exercised)."""
    from rusty_sr_tpu.utils.imageio import save_image
    rc = cli.main(["train", "o.rsr", "ti", "--crop", "100"])
    assert rc == 2
    assert "multiple of the factor" in capsys.readouterr().err
    rc = cli.main(["train", "o.rsr", "ti", "--crop", "0"])
    assert rc == 2
    rc = cli.main(["train", "o.rsr", "ti", "--trunk", "packed",
                   "--crop", "21"])
    assert rc == 2
    assert "even LR crop" in capsys.readouterr().err

    rng = np.random.default_rng(3)
    ti = tmp_path / "ti"
    ti.mkdir()
    save_image(str(ti / "t.png"), rng.random((80, 80, 3)).astype(np.float32))
    out = tmp_path / "out.rsr"
    rc = cli.main(["train", str(out), str(ti), "--crop", "48", "--remat",
                   "--batch", "2", "--max_steps", "2"])
    assert rc == 0
    assert out.stat().st_size == 1_043_676


def test_watch_scan_bookkeeping_stays_bounded(tmp_path):
    """Churn N files through the watched folder: done/fails stay
    O(current folder) — a months-long watcher must not grow per-file
    state forever (VERDICT r4 #6)."""
    import os
    from rusty_sr_tpu.cli import _watch_scan
    from rusty_sr_tpu.utils.imageio import save_image_u8
    done, fails = {}, {}
    rng = np.random.default_rng(0)
    for wave in range(6):
        # 3 fresh files per wave; previous wave's files deleted
        for f in list(tmp_path.glob("*.png")):
            f.unlink()
        names = [tmp_path / f"w{wave}_{i}.png" for i in range(3)]
        for p in names:
            save_image_u8(str(p), rng.integers(0, 256, (4, 4, 3),
                                               dtype=np.uint8))
        (tmp_path / f"w{wave}_junk.png").write_bytes(b"nope")
        pending = _watch_scan(str(tmp_path), done, fails)
        assert len(pending) == 4  # 3 good + 1 junk (decode decides later)
        # simulate the poll's outcome: goods done, junk failed
        for f, mt in pending:
            if "junk" in f:
                fails[f] = (mt, 1)
            else:
                done[f] = mt
        # bookkeeping bounded by the CURRENT folder, not history
        assert len(done) <= 3 and len(fails) <= 1, (done, fails)
    # a re-scan with nothing new pends nothing and keeps state bounded
    pending = _watch_scan(str(tmp_path), done, fails)
    assert pending == [(str(tmp_path / "w5_junk.png"),
                        os.path.getmtime(tmp_path / "w5_junk.png"))]
    assert len(done) == 3 and len(fails) == 1


def test_train_max_rss_budget_exit_and_resume(tmp_path, capsys):
    """--max_rss_gb: a run whose host RSS exceeds the budget checkpoints
    and exits rc 75 (EX_TEMPFAIL); a --resume relaunch continues and
    completes rc 0 — the leak-tolerant supervisor contract (the tunneled
    backend leaks host memory per transfer, PERF.md round 5)."""
    from rusty_sr_tpu.utils.imageio import save_image
    from rusty_sr_tpu.train import checkpoint as ckpt
    rng = np.random.default_rng(5)
    ti = tmp_path / "ti"
    ti.mkdir()
    save_image(str(ti / "a.png"), rng.random((40, 40, 3)).astype(np.float32))
    out = tmp_path / "o.rsr"
    ck = tmp_path / "ck"
    # a ~0 GB budget trips right after the first dispatch (the loop
    # guarantees >= 1 step of progress per leg so supervisors terminate)
    rc = cli.main(["train", str(out), str(ti), "--max_steps", "5",
                   "--ckpt_dir", str(ck), "--max_rss_gb", "0.001",
                   "--steps_per_dispatch", "1", "--platform", "cpu"])
    assert rc == 75
    assert "budget" in capsys.readouterr().err
    latest = ckpt.latest_native(str(ck))
    assert latest is not None
    rc = cli.main(["train", str(out), str(ti), "--max_steps", "5",
                   "--ckpt_dir", str(ck), "--resume", str(ck),
                   "--steps_per_dispatch", "1", "--platform", "cpu"])
    assert rc == 0
    assert ckpt.latest_native(str(ck)).endswith("step_00000005")
    assert out.stat().st_size == 1_043_676

"""Native C++ host-runtime lib vs numpy fallback parity."""

import numpy as np
import pytest

from rusty_sr_tpu.utils import native
from rusty_sr_tpu import params as P

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native lib unavailable (no toolchain)")
    return True


def test_gather_matches_numpy(lib_ok):
    img = RNG.random((37, 61, 3), dtype=np.float32)
    tile, halo = 16, 7
    ny, nx = -(-37 // tile), -(-61 // tile)
    zt, et, mt = native.gather_tiles(img, tile, halo, ny, nx)

    # independent numpy construction (tiling.py's original formulation)
    zero_img = np.pad(img, ((halo, halo + ny * tile - 37),
                            (halo, halo + nx * tile - 61), (0, 0)))
    edge_img = np.pad(img, ((halo, halo + ny * tile - 37),
                            (halo, halo + nx * tile - 61), (0, 0)), mode="edge")
    mask_img = np.pad(np.ones((37, 61, 1), np.float32),
                      ((halo, halo + ny * tile - 37),
                       (halo, halo + nx * tile - 61), (0, 0)))
    side = tile + 2 * halo
    k = 0
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * tile, ix * tile
            assert np.array_equal(zt[k], zero_img[y0:y0+side, x0:x0+side])
            assert np.array_equal(et[k], edge_img[y0:y0+side, x0:x0+side])
            assert np.array_equal(mt[k], mask_img[y0:y0+side, x0:x0+side])
            k += 1


def test_gather_edge_semantics_differ_from_zero(lib_ok):
    """Edge tiles must replicate borders where zero tiles have zeros."""
    img = np.full((10, 10, 3), 0.7, np.float32)
    zt, et, mt = native.gather_tiles(img, 10, 3, 1, 1)
    assert zt[0, 0, 0, 0] == 0.0
    assert et[0, 0, 0, 0] == pytest.approx(0.7)
    assert mt[0, 0, 0, 0] == 0.0
    assert mt[0, 3, 3, 0] == 1.0


def test_scatter_ragged(lib_ok):
    tf, nx = 9, 3
    canvas = np.zeros((20, 25, 3), np.float32)  # ragged vs 2x3 tiles of 9
    res = RNG.random((6, tf, tf, 3), dtype=np.float32)
    native.scatter_tiles(res[:4], 0, nx, canvas)
    native.scatter_tiles(res[4:], 4, nx, canvas)
    for k in range(6):
        iy, ix = divmod(k, nx)
        rows = min(20 - iy * tf, tf)
        cols = min(25 - ix * tf, tf)
        assert np.array_equal(canvas[iy*tf:iy*tf+rows, ix*tf:ix*tf+cols],
                              res[k, :rows, :cols])


def test_native_rsr_roundtrip_matches_python(lib_ok):
    flat = RNG.standard_normal(999).astype(np.float32)
    blob = native.rsr_encode(flat)
    assert blob == P.encode_rsr(flat)
    back = native.rsr_decode(blob)
    assert np.array_equal(back, flat)
    # python decoder accepts native blob and vice versa
    assert np.array_equal(P.decode_rsr(blob), flat)
    with pytest.raises(ValueError):
        native.rsr_decode(b"\x05\x00\x00\x00junk")


def test_native_decodes_reference_blob(lib_ok):
    with open("/root/reference/src/res/anime.rsr", "rb") as f:
        data = f.read()
    flat = native.rsr_decode(data)
    assert flat.shape == (130_459,)
    assert np.array_equal(flat, P.decode_rsr(data))


def test_concurrent_native_build_race(tmp_path):
    """N processes building the native lib from scratch concurrently:
    the cross-process flock + tmp-and-rename Makefile must give every
    process a loadable library (pre-fix, two g++ invocations raced on
    the same output file and one process could dlopen a half-written
    ELF or SIGBUS on an in-place truncation)."""
    import os
    import shutil
    import subprocess
    import sys
    import pytest
    from rusty_sr_tpu.utils import native as N
    so = N._LIB_PATH
    if not os.path.isdir(os.path.dirname(so)):
        pytest.skip("no native/ dir")
    if shutil.which("g++") is None and shutil.which("c++") is None:
        # without a toolchain the children cannot rebuild, and deleting
        # the prebuilt .so would strip the lib from later runs too
        pytest.skip("no C++ toolchain")
    if os.path.exists(so):
        os.unlink(so)   # force a rebuild in every child
    try:
        code = ("from rusty_sr_tpu.utils import native; "
                "import sys; sys.exit(0 if native.available() else 1)")
        procs = [subprocess.Popen([sys.executable, "-c", code])
                 for _ in range(4)]
        rcs = [p.wait(timeout=300) for p in procs]
        assert rcs == [0, 0, 0, 0]
        assert os.path.exists(so)
    finally:
        if not os.path.exists(so):  # leave the repo with its lib built
            subprocess.run(["make", "-C", os.path.dirname(so)],
                           capture_output=True)


def test_rsr_codec_fuzz_python_c_agreement(lib_ok):
    """Seeded malformed-blob fuzz: the C decoder must agree with the
    Python codec byte-for-byte on valid blobs and REJECT (never crash,
    never mis-decode) every corruption class — garbage, truncations,
    lying headers, lying size tables.  (3000-case offline sweep: 651
    valid-agree / 2349 consistent-reject / 0 disagreements.)"""
    from rusty_sr_tpu import params as P
    rng = np.random.default_rng(1)

    def py_decode(b):
        try:
            return np.asarray(P.decode_rsr(b), np.float32)
        except Exception:
            return None

    def c_decode(b):
        try:
            return native.rsr_decode(b)
        except Exception:
            return None

    for i in range(300):
        kind = rng.integers(0, 5)
        if kind == 0:      # valid
            n = int(rng.integers(0, 80))
            v = rng.standard_normal(n).astype("<f4")
            b = (np.uint32(n).tobytes() + np.full(n, 4, "<u4").tobytes()
                 + v.tobytes())
        elif kind == 1:    # garbage
            b = rng.bytes(int(rng.integers(0, 200)))
        elif kind == 2:    # truncated
            n = int(rng.integers(1, 60))
            v = rng.standard_normal(n).astype("<f4")
            full = (np.uint32(n).tobytes()
                    + np.full(n, 4, "<u4").tobytes() + v.tobytes())
            b = full[: int(rng.integers(0, len(full)))]
        elif kind == 3:    # huge-N header lie
            b = np.uint32(rng.integers(2**20, 2**32 - 1, dtype=np.uint64)
                          ).tobytes() + rng.bytes(48)
        else:              # size-table lie
            n = int(rng.integers(1, 40))
            sizes = np.full(n, 4, "<u4")
            sizes[rng.integers(0, n)] = rng.integers(0, 9)
            v = rng.standard_normal(n).astype("<f4")
            b = np.uint32(n).tobytes() + sizes.tobytes() + v.tobytes()
        pr, cr = py_decode(bytes(b)), c_decode(bytes(b))
        assert (pr is None) == (cr is None), (kind, i)
        if pr is not None:
            np.testing.assert_array_equal(pr, cr, err_msg=f"{kind},{i}")


# ---------------------------------------------------------------------------
# Fast PNG codec (native/pngio.cc) — lossless parity with PIL in both
# directions, plus the imageio wiring that routes the hot serving path
# through it.

@pytest.fixture(scope="module")
def png_ok():
    if not native.png_available():
        pytest.skip("native png codec unavailable (no toolchain/libpng)")
    return True


def _pil_decode(data: bytes) -> np.ndarray:
    import io
    from PIL import Image
    with Image.open(io.BytesIO(data)) as img:
        return np.asarray(img.convert("RGB"))


def test_png_encode_roundtrip_levels_threads(png_ok):
    # gradient + noise exercises both the Sub filter and deflate matching;
    # ragged sizes exercise slab/row boundary math.
    for h, w in [(1, 1), (1, 97), (63, 1), (41, 53), (257, 129)]:
        img = (RNG.integers(0, 256, (h, w, 3))).astype(np.uint8)
        for level in (0, 1, 6):
            for threads in (1, 3):
                data = native.png_encode(img, level=level, threads=threads)
                assert data is not None
                assert np.array_equal(_pil_decode(data), img), (
                    f"lossy at {h}x{w} level={level} threads={threads}")


def test_png_encode_writes_rgba_alpha_255(png_ok):
    # reference parity: PNG outputs are RGBA with alpha=255
    # (reference src/main.rs:175 .to_rgba().save)
    import io
    from PIL import Image
    img = RNG.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    data = native.png_encode(img)
    with Image.open(io.BytesIO(data)) as out:
        assert out.mode == "RGBA"
        a = np.asarray(out)
    assert (a[..., 3] == 255).all()
    assert np.array_equal(a[..., :3], img)


def test_png_encode_deterministic(png_ok):
    img = RNG.integers(0, 256, (300, 200, 3)).astype(np.uint8)
    a = native.png_encode(img, level=1, threads=2)
    b = native.png_encode(img, level=1, threads=2)
    assert a == b


def test_png_decode_matches_pil_all_modes(png_ok):
    """Every PIL-writable 8-bit mode: native decode == PIL convert('RGB')."""
    import io
    from PIL import Image
    rgb = RNG.integers(0, 256, (21, 17, 3)).astype(np.uint8)
    rgba = np.concatenate(
        [rgb, RNG.integers(0, 256, (21, 17, 1)).astype(np.uint8)], axis=2)
    cases = {
        "RGB": Image.fromarray(rgb, "RGB"),
        "RGBA": Image.fromarray(rgba, "RGBA"),  # alpha DROPPED, not composited
        "L": Image.fromarray(rgb[..., 0], "L"),
        "LA": Image.fromarray(np.stack([rgb[..., 0], rgba[..., 3]], -1), "LA"),
        "P": Image.fromarray(rgb, "RGB").convert(
            "P", palette=Image.Palette.ADAPTIVE),
    }
    for mode, img in cases.items():
        buf = io.BytesIO()
        img.save(buf, "PNG")
        data = buf.getvalue()
        want = _pil_decode(data)
        got = native.png_decode(data)
        assert got is not None, mode
        assert np.array_equal(got, want), f"mode {mode} decode mismatch"


def test_png_decode_rejects_16bit_and_garbage(png_ok):
    import io
    from PIL import Image
    # 16-bit: PIL and libpng round 16->8 differently; must fall back (None)
    img16 = Image.fromarray(
        (RNG.integers(0, 65536, (9, 9))).astype(np.uint16), "I;16")
    buf = io.BytesIO()
    img16.save(buf, "PNG")
    assert native.png_decode(buf.getvalue()) is None
    assert native.png_decode(b"not a png at all") is None
    # truncated file: error, not crash
    ok = native.png_encode(RNG.integers(0, 256, (32, 32, 3)).astype(np.uint8))
    assert native.png_decode(ok[: len(ok) // 2]) is None


def test_imageio_png_routes_native_and_matches_pil(png_ok, tmp_path):
    """save/load through imageio: native path and PIL agree pixel-exactly,
    and a PIL-written file reads back identically through the native path."""
    from rusty_sr_tpu.utils import imageio
    from PIL import Image
    img = RNG.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    p = str(tmp_path / "a.png")
    imageio.save_image_u8(p, img)
    assert open(p, "rb").read(8) == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(imageio.load_image_u8(p), img)
    with Image.open(p) as back:          # PIL can read our encoder's output
        assert np.array_equal(np.asarray(back.convert("RGB")), img)
    p2 = str(tmp_path / "b.png")
    Image.fromarray(img, "RGB").convert("RGBA").save(p2)
    assert np.array_equal(imageio.load_image_u8(p2), img)
    f = imageio.load_image(p2)
    assert f.dtype == np.float32
    assert np.array_equal(f, img.astype(np.float32) / 255.0)


def test_imageio_misextensioned_file_falls_back(png_ok, tmp_path):
    """A JPEG named .png must still load (PIL sniffs content, we only
    fast-path real PNG signatures)."""
    from rusty_sr_tpu.utils import imageio
    from PIL import Image
    img = np.full((16, 16, 3), 128, np.uint8)
    p = str(tmp_path / "fake.png")
    Image.fromarray(img, "RGB").save(p, "JPEG")
    out = imageio.load_image_u8(p)
    assert out.shape == (16, 16, 3)


def test_png_decode_bomb_guard(png_ok, tmp_path, monkeypatch):
    """A ~60-byte PNG claiming gigapixel IHDR dims must NOT make the
    native path allocate h*w*3 — it declines (None) past PIL's
    MAX_IMAGE_PIXELS so the PIL fallback applies PIL's own
    decompression-bomb policy (watch mode reads untrusted folders)."""
    import struct
    import zlib
    from PIL import Image
    from rusty_sr_tpu.utils import imageio

    def chunk(t, d):
        c = t + d
        return struct.pack(">I", len(d)) + c + struct.pack(">I", zlib.crc32(c))

    def tiny_png_claiming(w, h):
        ihdr = struct.pack(">II5B", w, h, 8, 6, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00"))
                + chunk(b"IEND", b""))

    bomb = tiny_png_claiming(1 << 16, 1 << 16)  # 66 bytes claiming 4.3 Gpx
    assert native.png_decode(bomb) is None
    p = str(tmp_path / "bomb.png")
    with open(p, "wb") as f:
        f.write(bomb)
    with pytest.raises(Exception) as exc:  # PIL DecompressionBombError
        imageio.load_image_u8(p)
    assert "exceeds limit" in str(exc.value) or "pixels" in str(exc.value)

    # The guard respects a user's PIL override (the documented PIL knob).
    img = (RNG.integers(0, 256, (32, 32, 3))).astype(np.uint8)
    data = native.png_encode(img)
    assert np.array_equal(native.png_decode(data), img)
    monkeypatch.setattr(Image, "MAX_IMAGE_PIXELS", 100)
    assert native.png_decode(data) is None      # 1024 px > 100: decline
    monkeypatch.setattr(Image, "MAX_IMAGE_PIXELS", None)  # None = off
    assert np.array_equal(native.png_decode(data), img)


def test_png_codec_degenerate_sizes(png_ok):
    """1x1 / 1xN / Nx1 / tiny images survive encode->decode (native and
    PIL differential) at every level/thread combination — the Sub filter
    and slab splitter must not assume width or height > 1."""
    import io
    from PIL import Image
    bad = []
    for h, w in [(1, 1), (1, 7), (7, 1), (1, 513), (513, 1), (2, 2), (3, 5)]:
        img = RNG.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for lvl in (1, 6):
            for thr in (1, 0, 4):
                data = native.png_encode(img, level=lvl, threads=thr)
                assert data is not None, (h, w, lvl, thr)
                out = native.png_decode(data)
                if out is None or not np.array_equal(out, img):
                    bad.append((h, w, lvl, thr, "native"))
                pil = np.asarray(
                    Image.open(io.BytesIO(data)).convert("RGB")).reshape(h, w, 3)
                if not np.array_equal(pil, img):
                    bad.append((h, w, lvl, thr, "pil"))
    assert not bad, bad


def test_png_decode_gamma_chunk_parity(png_ok):
    """libpng's simplified API sRGB-remaps samples of files carrying a
    non-sRGB gAMA chunk (no sRGB chunk); PIL returns the raw bytes.  The
    native path must DECLINE those (PIL fallback keeps decode parity) and
    keep decoding in-tolerance / sRGB-chunked files natively."""
    import io
    import struct
    import zlib
    from PIL import Image

    img = RNG.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, "RGB").save(buf, "PNG")
    base = buf.getvalue()

    def with_chunks(chunks):
        pos = 8 + 4 + 4 + 13 + 4  # after IHDR
        blob = b""
        for ctype, cdata in chunks:
            c = ctype + cdata
            blob += (struct.pack(">I", len(cdata)) + c
                     + struct.pack(">I", zlib.crc32(c)))
        return base[:pos] + blob + base[pos:]

    def gama(v):
        return (b"gAMA", struct.pack(">I", v))

    srgb = (b"sRGB", b"\x00")
    # Must decline (libpng would remap, PIL would not):
    for chunks in ([gama(100000)], [gama(40909)], [gama(50000)]):
        assert native.png_decode(with_chunks(chunks)) is None, chunks
    # Must decode natively AND byte-match PIL (no remap happens):
    for chunks in ([gama(45455)], [srgb, gama(100000)],
                   [gama(100000), srgb], []):
        data = with_chunks(chunks)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        got = native.png_decode(data)
        assert got is not None and np.array_equal(got, pil), chunks
        assert np.array_equal(got, img)


def test_png_encode_fh_codec_lossless_fuzz(png_ok):
    """Round-5 fast-Huffman codec (the default; PERF.md probe61 —
    ~3.6x zlib-L1 at ~0.88x file size on the serving payload class):
    lossless through PIL at fuzz geometries and content classes, for
    both codecs explicitly, any thread count."""
    rng = np.random.default_rng(61)
    cases = []
    for h, w in [(1, 1), (2, 3), (17, 31), (257, 129), (100, 300)]:
        cases.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        cases.append(np.zeros((h, w, 3), np.uint8))
        g = np.linspace(0, 255, h * w * 3).reshape(h, w, 3)
        cases.append(g.astype(np.uint8))
    big = np.zeros((600, 40, 3), np.uint8)  # >258-byte zero runs + slabs
    big[300:] = 77
    cases.append(big)
    for img in cases:
        for codec in ("fh", "zlib"):
            for threads in (1, 3):
                data = native.png_encode(img, codec=codec, threads=threads)
                assert data is not None
                assert np.array_equal(_pil_decode(data), img)


def test_png_encode_fh_deterministic_and_smaller(png_ok):
    """fh byte-determinism for a given (input, threads); on photo-class
    content its files must not regress past the documented ~1.1x of the
    zlib-L1 size (probe61 measured ~0.88x — this is a loose tripwire)."""
    from PIL import Image
    img = np.asarray(Image.open(
        "/root/reference/docs/bank_rs.png").convert("RGB"))
    a = native.png_encode(img, codec="fh", threads=2)
    b = native.png_encode(img, codec="fh", threads=2)
    assert a == b
    z = native.png_encode(img, codec="zlib", level=1, threads=2)
    assert len(a) < 1.1 * len(z), (len(a), len(z))


def test_png_encode_rejects_bad_codec(png_ok):
    import pytest as _pytest
    with _pytest.raises(ValueError):
        native.png_encode(np.zeros((4, 4, 3), np.uint8), codec="lz4")

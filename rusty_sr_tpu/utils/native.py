"""ctypes bindings for the native host-runtime library (native/tileio.cc).

The reference's host data path (alumina suppliers, bytevec codec) is native
Rust; ours is native C++: tile gather/scatter for overlap-tile inference
and the `.rsr` codec.  Builds on demand with `make` (g++ is baked into the
image; pybind11 is not, hence plain C ABI + ctypes).  Every entry point has
a pure-numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsrtileio.so")

_lock = threading.Lock()
_lib = None
_tried = False

_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_i64 = ctypes.c_int64
_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _make_target(target: str) -> bool:
    """Build ONE Makefile target under a cross-process flock.

    Per-target (not `make all`): the png codec links system libpng/zlib,
    and a host missing those dev files must still get the dep-free tileio
    library.  Caller holds the per-process lock.
    """
    if not os.path.isdir(_NATIVE_DIR):
        return False
    import fcntl
    with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, target],
                           check=True, capture_output=True)
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
    return True


def _build_and_load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            # Always run make: it no-ops when the .so is fresh, rebuilds
            # after a tileio.cc edit, and (because the binary is built
            # with -march=native and NOT checked in) guarantees the
            # loaded library matches this host's ISA — a stale foreign
            # binary would SIGILL at call time, past this except.
            # The threading.Lock above is per-process only; multi-host
            # training and parallel pytest reach here concurrently, so
            # serialise the build itself with a cross-process flock (the
            # Makefile's tmp+rename makes the final .so atomic, the lock
            # stops N compilers racing on the same tmp-free no-op check).
            _make_target("libsrtileio.so")
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sr_gather_tiles.argtypes = [
                _f32p, _i64, _i64, _i64, _i64, _i64, _i64, _f32p, _f32p, _f32p]
            lib.sr_gather_tiles.restype = None
            lib.sr_gather_tiles_range.argtypes = [
                _f32p, _i64, _i64, _i64, _i64, _i64, _i64, _i64,
                _f32p, _f32p, _f32p]
            lib.sr_gather_tiles_range.restype = None
            lib.sr_scatter_tiles.argtypes = [
                _f32p, _i64, _i64, _i64, _i64, _f32p, _i64, _i64]
            lib.sr_scatter_tiles.restype = None
            lib.rsr_decode.argtypes = [_u8p, _i64, _f32p, _i64]
            lib.rsr_decode.restype = _i64
            lib.rsr_encode.argtypes = [_f32p, _i64, _u8p]
            lib.rsr_encode.restype = None
            _lib = lib
        except (OSError, subprocess.CalledProcessError) as e:
            # No toolchain (or no native/ dir) => quiet numpy fallback by
            # design; a FAILED compile must be visible — silently running
            # the O(n) Python tile path would look like a 10-100x perf
            # regression with no message anywhere.
            err = getattr(e, "stderr", b"") or b""
            if err:
                import sys
                print("warning: native tileio build failed, using numpy "
                      f"fallback:\n{err.decode(errors='replace')}",
                      file=sys.stderr)
            _lib = None
        return _lib


def available() -> bool:
    return _build_and_load() is not None


def gather_tiles(img: np.ndarray, tile: int, halo: int, ny: int, nx: int):
    """(H,W,3) f32 -> (zero_tiles, edge_tiles, mask_tiles) as in tiling.py."""
    return gather_tiles_range(img, tile, halo, nx, 0, ny * nx)


def gather_tiles_range(img: np.ndarray, tile: int, halo: int, nx: int,
                       t0: int, t1: int):
    """Ranged f32 tile gather: tiles [t0, t1) of the row-major grid,
    straight from the UNPADDED image — O(t1-t0) host memory at any image
    size (the tiling drivers gather per dispatch chunk; VERDICT r4 #5).
    Layout identical to the full gather's [t0:t1] slice."""
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w, _ = img.shape
    side = tile + 2 * halo
    n = t1 - t0
    zt = np.empty((n, side, side, 3), np.float32)
    et = np.empty((n, side, side, 3), np.float32)
    mt = np.empty((n, side, side, 1), np.float32)
    lib = _build_and_load()
    if lib is not None:
        lib.sr_gather_tiles_range(img, h, w, tile, halo, nx, t0, t1,
                                  zt, et, mt.reshape(n, side, side))
        return zt, et, mt
    # numpy fallback (same layout contract; per-tile windows, no
    # whole-image pad copies)
    zt[:] = 0.0
    mt[:] = 0.0
    for k in range(n):
        iy, ix = divmod(t0 + k, nx)
        y0, x0 = iy * tile - halo, ix * tile - halo
        ylo, yhi = max(y0, 0), min(y0 + side, h)
        xlo, xhi = max(x0, 0), min(x0 + side, w)
        sub = img[ylo:yhi, xlo:xhi]
        ry, rx = ylo - y0, xlo - x0
        et[k] = np.pad(sub, ((ry, side - ry - sub.shape[0]),
                             (rx, side - rx - sub.shape[1]), (0, 0)),
                       mode="edge")
        zt[k, ry:ry + sub.shape[0], rx:rx + sub.shape[1]] = sub
        mt[k, ry:ry + sub.shape[0], rx:rx + sub.shape[1]] = 1.0
    return zt, et, mt


def scatter_tiles(results: np.ndarray, start: int, nx: int, canvas: np.ndarray):
    """Write (count, tf, tf, 3) HR tiles into the (crop_h, crop_w, 3) canvas."""
    results = np.ascontiguousarray(results, dtype=np.float32)
    count, tf = results.shape[0], results.shape[1]
    crop_h, crop_w, _ = canvas.shape
    lib = _build_and_load()
    if lib is not None:
        lib.sr_scatter_tiles(results, count, start, nx, tf, canvas,
                             crop_h, crop_w)
        return
    for j in range(count):
        k = start + j
        iy, ix = divmod(k, nx)
        y0, x0 = iy * tf, ix * tf
        rows = max(0, min(crop_h - y0, tf))
        cols = max(0, min(crop_w - x0, tf))
        if rows and cols:
            canvas[y0:y0 + rows, x0:x0 + cols] = results[j, :rows, :cols]


def rsr_decode(data: bytes) -> np.ndarray | None:
    """Native .rsr decode; None if the native lib is unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    cap = max(0, (len(data) - 4) // 8)
    out = np.empty(cap, np.float32)
    n = lib.rsr_decode(np.ascontiguousarray(buf), len(data), out, cap)
    if n < 0:
        raise ValueError("malformed .rsr blob")
    return out[:n].copy()


def rsr_encode(flat: np.ndarray) -> bytes | None:
    lib = _build_and_load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat, dtype=np.float32)
    out = np.empty(4 + 8 * flat.size, np.uint8)
    lib.rsr_encode(flat, flat.size, out)
    return out.tobytes()


# ---------------------------------------------------------------------------
# Fast PNG codec (native/pngio.cc) — the folder/watch serving limiter is
# host PNG encode (PERF.md), so the hot path gets a native one: fixed Sub
# filter + zlib level 1 + pigz-style parallel deflate.  Every caller falls
# back to PIL when this returns None (no toolchain / no libpng / odd file).

_PNG_LIB_PATH = os.path.join(_NATIVE_DIR, "libsrpng.so")
_png_lib = None
_png_tried = False


def _png_load():
    global _png_lib, _png_tried
    with _lock:
        if _png_lib is not None or _png_tried:
            return _png_lib
        _png_tried = True
        try:
            _make_target("libsrpng.so")
            lib = ctypes.CDLL(_PNG_LIB_PATH)
            lib.sr_png_bound.argtypes = [_i64, _i64]
            lib.sr_png_bound.restype = _i64
            lib.sr_png_encode.argtypes = [
                _u8p, _i64, _i64, _i64, _i64, _u8p, _i64]
            lib.sr_png_encode.restype = _i64
            lib.sr_png_encode2.argtypes = [
                _u8p, _i64, _i64, _i64, _i64, _i64, _u8p, _i64]
            lib.sr_png_encode2.restype = _i64
            lib.sr_png_info.argtypes = [_u8p, _i64, _i64p]
            lib.sr_png_info.restype = _i64
            lib.sr_png_decode.argtypes = [_u8p, _i64, _u8p, _i64, _i64]
            lib.sr_png_decode.restype = _i64
            _png_lib = lib
        except (OSError, subprocess.CalledProcessError) as e:
            err = getattr(e, "stderr", b"") or b""
            if err:
                import sys
                print("warning: native png codec build failed, using PIL "
                      f"fallback:\n{err.decode(errors='replace')}",
                      file=sys.stderr)
            _png_lib = None
        return _png_lib


def png_available() -> bool:
    return _png_load() is not None


def png_encode(rgb: np.ndarray, level: int = 1,
               threads: int = 0, codec: str = "fh") -> bytes | None:
    """(H,W,3) u8 -> RGBA PNG bytes; None if the native codec is unavailable.

    codec: "fh" (default) — the fast-Huffman deflate (one dynamic-Huffman
    block per slab, literals + dist-1 runs, no zlib state machine;
    PERF.md probe61: ~3x zlib-L1 throughput at comparable size on photo
    content); "zlib" — zlib deflate at `level` (0..9, 0 = stored; kept
    for ratio-sensitive callers and as the measured reference point).
    threads<=0: one deflate thread per started MB of filtered data,
    capped at the host's cores (determinism: the byte stream depends on
    the slab count, which this rule fixes for a given image size and
    host).
    """
    if codec not in ("zlib", "fh"):
        # before the lib check: a typo'd codec must raise on toolchain-
        # free hosts too, not silently fall back to PIL
        raise ValueError(f"codec must be 'zlib' or 'fh', got {codec!r}")
    lib = _png_load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        return None
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        return None
    if threads <= 0:
        raw_mb = (h * (1 + 4 * w)) >> 20
        threads = max(1, min(os.cpu_count() or 1, raw_mb))
    out = np.empty(int(lib.sr_png_bound(h, w)), np.uint8)
    n = lib.sr_png_encode2(rgb, h, w, int(level), int(threads),
                           1 if codec == "fh" else 0, out, out.size)
    if n < 0:
        return None
    return out[:n].tobytes()


def png_decode(data: bytes) -> np.ndarray | None:
    """PNG bytes -> (H,W,3) u8 (alpha DROPPED, PIL convert('RGB') parity);
    None for anything the native path doesn't cover (16-bit, non-PNG...)."""
    lib = _png_load()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    hw = np.zeros(2, np.int64)
    if lib.sr_png_info(buf, len(data), hw) != 0:
        return None
    h, w = int(hw[0]), int(hw[1])
    # Decompression-bomb guard: a ~50-byte file can claim gigapixel IHDR
    # dims; allocating (h,w,3) from them would let a crafted input OOM a
    # resident watch server.  PIL owns this policy (Image.MAX_IMAGE_PIXELS,
    # user-overridable) — past its limit, decline so the caller's PIL
    # fallback applies PIL's exact warn/raise semantics.
    try:
        from PIL import Image
        max_px = Image.MAX_IMAGE_PIXELS
    except ImportError:                    # no PIL: keep a safety net anyway
        max_px = 1024 * 1024 * 1024 // 4 // 3  # PIL's default (89,478,485 px)
    if max_px is not None and h * w > max_px:
        return None
    out = np.empty((h, w, 3), np.uint8)
    if lib.sr_png_decode(buf, len(data), out.reshape(-1), h, w) != 0:
        return None
    return out

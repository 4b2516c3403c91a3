"""Host-side image I/O: PNG u8 <-> f32 [0,1] sRGB code values.

Mirrors alumina's `img_to_data` / `data_to_img` (reference src/main.rs:170,
175; SURVEY.md §8.7): load drops alpha and divides by 255 with no gamma
change; save clamps to [0,1], scales by 255, rounds half-away-from-zero,
and writes RGBA PNG.  This is host code feeding device buffers — kept in
numpy so the device never sees u8<->f32 conversion work.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Exceptions a decode raises for a bad or hostile FILE (as opposed to a
# bug): PIL wraps unrecognised / truncated files in OSError subclasses,
# but its decompression-bomb guard raises DecompressionBombError, which
# subclasses Exception DIRECTLY — a skip-unreadable-files loop that
# catches OSError alone dies on a crafted gigapixel-header PNG (fatal
# for the resident `watch` server, which reads untrusted folders).
# Every CLI / data-pipeline decode site catches this tuple.
DECODE_ERRORS = (OSError, Image.DecompressionBombError)


def _native_png_read(path: str) -> np.ndarray | None:
    """Native fast-path PNG decode (native/pngio.cc): returns (H,W,3) u8 or
    None for non-PNG files / 16-bit depth / no toolchain — caller uses PIL.
    Pixel semantics match PIL convert("RGB"): alpha DROPPED, not composited.
    """
    if not path.lower().endswith(".png"):
        return None
    from rusty_sr_tpu.utils import native
    try:
        with open(path, "rb") as f:
            head = f.read(8)
            if head != _PNG_SIG:
                return None  # mis-extensioned file: let PIL sniff it
            data = head + f.read()
    except OSError:
        return None  # surface the real error through the PIL path
    return native.png_decode(data)


def load_image(path: str) -> np.ndarray:
    """PNG/JPEG -> (H,W,3) f32 sRGB in [0,1] (alpha dropped)."""
    u8 = _native_png_read(path)
    if u8 is not None:
        return u8.astype(np.float32) / 255.0
    # `with`: multi-frame formats (GIF/TIFF) keep the fd open past
    # load(), leaking descriptors across a streamed training epoch.
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0


def load_image_u8(path: str) -> np.ndarray:
    """PNG/JPEG -> (H,W,3) u8 (alpha dropped) — for u8-I/O device paths."""
    u8 = _native_png_read(path)
    if u8 is not None:
        return u8
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"))


def _save_u8(path: str, u8: np.ndarray, png_threads: int = 0) -> None:
    """RGBA for PNG (reference parity: .to_rgba().save, src/main.rs:175);
    plain RGB for formats that reject alpha (JPEG and friends) — an
    OSError AFTER the whole upscale ran would throw the result away.

    PNGs go through the native encoder (Sub filter + zlib level 1 +
    parallel deflate, native/pngio.cc) when available: host PNG encode is
    the measured folder/watch serving limiter (PERF.md), and the native
    path is ~5-7x PIL per core at comparable file size.  Write is
    tmp+rename so a crash mid-encode never leaves a truncated output.
    """
    if path.lower().endswith(".png"):
        from rusty_sr_tpu.utils import native
        data = native.png_encode(u8, level=1, threads=png_threads)
        if data is not None:
            tmp = f"{path}.tmp.{os.getpid()}"
            try:
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)
            except BaseException:
                # BaseException: a KeyboardInterrupt between open and
                # replace must not strand `<out>.tmp.<pid>` in the output
                # folder (a resident watcher accumulates them)
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
            return
    img = Image.fromarray(u8, mode="RGB")
    if path.lower().endswith((".png", ".tif", ".tiff", ".webp")):
        img = img.convert("RGBA")
    img.save(path)


def save_image_u8(path: str, u8: np.ndarray, png_threads: int = 0) -> None:
    """(H,W,3) u8 -> RGBA PNG (matches `save_image` after to_u8).

    png_threads: intra-image deflate threads for the native PNG path
    (0 = auto).  Pool callers (_AsyncWriter) pass 1 — they already
    saturate the host's cores across images."""
    _save_u8(path, np.asarray(u8, np.uint8), png_threads=png_threads)


def save_image(path: str, data: np.ndarray) -> None:
    """(H,W,3) f32 -> clamp [0,1] -> round -> u8 RGBA PNG (src/main.rs:175)."""
    data = np.clip(np.asarray(data, dtype=np.float32), 0.0, 1.0)
    u8 = np.floor(data * 255.0 + 0.5).astype(np.uint8)  # round half away from zero
    _save_u8(path, u8)


def to_u8(data: np.ndarray) -> np.ndarray:
    """Same quantisation as `save_image` without the file write."""
    data = np.clip(np.asarray(data, dtype=np.float32), 0.0, 1.0)
    return np.floor(data * 255.0 + 0.5).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    """-10*log10(mean squared error) — the reference's validation metric
    (src/main.rs:245)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(-10.0 * np.log10(mse / (peak * peak)))

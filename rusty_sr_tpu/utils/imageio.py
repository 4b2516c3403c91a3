"""Host-side image I/O: PNG u8 <-> f32 [0,1] sRGB code values.

Mirrors alumina's `img_to_data` / `data_to_img` (reference src/main.rs:170,
175; SURVEY.md §8.7): load drops alpha and divides by 255 with no gamma
change; save clamps to [0,1], scales by 255, rounds half-away-from-zero,
and writes RGBA PNG.  This is host code feeding device buffers — kept in
numpy so the device never sees u8<->f32 conversion work.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_image(path: str) -> np.ndarray:
    """PNG/JPEG -> (H,W,3) f32 sRGB in [0,1] (alpha dropped)."""
    # `with`: multi-frame formats (GIF/TIFF) keep the fd open past
    # load(), leaking descriptors across a streamed training epoch.
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0


def load_image_u8(path: str) -> np.ndarray:
    """PNG/JPEG -> (H,W,3) u8 (alpha dropped) — for u8-I/O device paths."""
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"))


def _save_u8(path: str, u8: np.ndarray) -> None:
    """RGBA for PNG (reference parity: .to_rgba().save, src/main.rs:175);
    plain RGB for formats that reject alpha (JPEG and friends) — an
    OSError AFTER the whole upscale ran would throw the result away."""
    img = Image.fromarray(u8, mode="RGB")
    if path.lower().endswith((".png", ".tif", ".tiff", ".webp")):
        img = img.convert("RGBA")
    img.save(path)


def save_image_u8(path: str, u8: np.ndarray) -> None:
    """(H,W,3) u8 -> RGBA PNG (matches `save_image` after to_u8)."""
    _save_u8(path, np.asarray(u8, np.uint8))


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

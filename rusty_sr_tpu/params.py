"""Parameter store: `.rsr` codec, flat<->pytree layout, initialisation.

The reference serialises its full flat f32 parameter vector with the Rust
`bytevec` crate (`<Vec<f32>>::encode::<u32>` / `decode`, reference
src/main.rs:146,213).  Wire format (SURVEY.md §8.1, verified against all
three 1,043,676-byte blobs in reference src/res/):

    u32 LE  N                 element count
    u32 LE  size[i] * N       per-element byte-size table (always 4)
    f32 LE  value[i] * N      payload

The flat ordering follows alumina's parameter allocation order, which is op
insertion order in `sr_net` (reference src/network.rs:33-72); conv weight
blocks are row-major ``(C_out, k_h, k_w, C_in)`` (SURVEY.md §8.2/8.3).

TPU-side we keep parameters as a dict pytree with conv weights already in
HWIO layout — the layout `lax.conv_general_dilated` consumes natively on
the MXU — so the transpose cost is paid once at load, never per step.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

Pytree = Dict[str, np.ndarray]

# Per-op MSRA gains used by the reference (src/network.rs:33,60-72).
_CONV_GAINS = {
    "conv0": 1.0,
    "conv1": 0.1, "conv2": 0.1, "conv3": 0.1,
    "conv5": 0.1, "conv6": 0.1, "conv7": 0.1,
    "conv8": 0.1, "conv9": 0.1, "conv10": 0.1,
}

BUILTIN_WEIGHTS = ("imagenet", "imagenetlinear", "anime")


def _builtin_dir() -> str:
    """Directory holding the three builtin `.rsr` blobs.

    The reference embeds them in its binary (src/main.rs:26-28
    `include_bytes!`); here they ship as package data in
    ``rusty_sr_tpu/weights/`` so the framework is self-contained.
    ``RUSTY_SR_TPU_WEIGHTS_DIR`` overrides (e.g. for alternative sets).
    """
    import os
    env = os.environ.get("RUSTY_SR_TPU_WEIGHTS_DIR")
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights")


def param_specs(factor: int, width: int = 32, channels: int = 3) -> List[Tuple[str, Tuple[int, ...]]]:
    """Ordered (name, OHWI-shape) spec of the flat parameter vector.

    Order = op insertion order of the reference graph build
    (src/network.rs:33-72; table in SURVEY.md §8.2).  Factor-generic: the
    `expand` head has ``channels * factor**2`` output channels.
    """
    n = width
    e = channels * factor * factor
    return [
        ("conv0", (n, 5, 5, channels)),
        ("f_bias", (n,)),
        ("f_belu", (n,)),
        ("expand_bias", (e,)),
        ("l1_bias", (n,)), ("l2_bias", (n,)), ("l3_bias", (n,)),
        ("l1_belu", (n,)), ("l2_belu", (n,)), ("l3_belu", (n,)),
        ("conv1", (n, 5, 5, n)), ("conv2", (n, 5, 5, n)), ("conv3", (n, 5, 5, n)),
        ("conv5", (n, 3, 3, n)), ("conv6", (n, 3, 3, n)),
        ("conv7", (e, 3, 3, n)),
        ("conv8", (n, 3, 3, n)),
        ("conv9", (e, 3, 3, n)), ("conv10", (e, 3, 3, n)),
    ]


def num_params(factor: int, width: int = 32, channels: int = 3) -> int:
    """Total flat parameter count (130,459 for factor=3; SURVEY.md §8.2)."""
    return sum(int(np.prod(s)) for _, s in param_specs(factor, width, channels))


def decode_rsr(data: bytes) -> np.ndarray:
    """Decode a bytevec-framed `.rsr` blob into a flat f32 vector.

    Uses the native C++ codec (`native/tileio.cc`, cross-validated in
    tests/test_native.py) when the library is available; the pure-numpy
    path below is the fallback and the executable spec."""
    from rusty_sr_tpu.utils import native
    try:
        flat = native.rsr_decode(data)
    except ValueError:
        flat = None   # malformed: numpy path below gives the specific error
    if flat is not None:
        return flat
    if len(data) < 4:
        raise ValueError("rsr blob too short for header")
    (n,) = struct.unpack_from("<I", data, 0)
    expected = 4 + 8 * n
    if len(data) != expected:
        raise ValueError(f"rsr blob length {len(data)} != {expected} for N={n}")
    sizes = np.frombuffer(data, dtype="<u4", count=n, offset=4)
    if not np.all(sizes == 4):
        raise ValueError("rsr size table contains non-f32 entries")
    return np.frombuffer(data, dtype="<f4", count=n, offset=4 + 4 * n).copy()


def encode_rsr(flat: np.ndarray) -> bytes:
    """Encode a flat f32 vector in the reference's bytevec framing
    (native codec when available; numpy fallback)."""
    from rusty_sr_tpu.utils import native
    out = native.rsr_encode(flat)
    if out is not None:
        return out
    flat = np.ascontiguousarray(flat, dtype="<f4")
    n = flat.size
    header = struct.pack("<I", n)
    sizes = np.full(n, 4, dtype="<u4")
    return header + sizes.tobytes() + flat.tobytes()


def flat_to_pytree(flat: np.ndarray, factor: int, width: int = 32, channels: int = 3) -> Pytree:
    """Split the flat vector into named arrays; convs become HWIO.

    The flat blocks are ``(C_out, k_h, k_w, C_in)`` row-major (SURVEY.md
    §8.2); HWIO = transpose(1, 2, 3, 0).
    """
    specs = param_specs(factor, width, channels)
    total = sum(int(np.prod(s)) for _, s in specs)
    if flat.size != total:
        raise ValueError(f"flat vector has {flat.size} params, expected {total}")
    tree: Pytree = {}
    off = 0
    for name, shape in specs:
        cnt = int(np.prod(shape))
        # copy=True: without it 1-D leaves (biases, BeLU slopes) would be
        # live VIEWS into the caller's flat vector while the transposed
        # 4-D conv leaves are copies — mutating the flat buffer afterwards
        # (weight averaging, reusing a decode buffer) would silently
        # produce a mixed-state tree.
        block = np.array(flat[off:off + cnt], dtype=np.float32,
                         copy=True).reshape(shape)
        if len(shape) == 4:
            block = np.ascontiguousarray(block.transpose(1, 2, 3, 0))  # OHWI -> HWIO
        tree[name] = block
        off += cnt
    return tree


def pytree_to_flat(tree: Pytree, factor: int, width: int = 32, channels: int = 3) -> np.ndarray:
    """Inverse of `flat_to_pytree` — emits the reference's flat ordering."""
    specs = param_specs(factor, width, channels)
    parts = []
    for name, shape in specs:
        block = np.asarray(tree[name], dtype=np.float32)
        if len(shape) == 4:
            block = block.transpose(3, 0, 1, 2)  # HWIO -> OHWI
        if block.shape != shape:
            raise ValueError(f"{name}: shape {block.shape} != spec {shape}")
        parts.append(block.reshape(-1))
    return np.concatenate(parts)


def init_params(rng: np.random.Generator | int, factor: int, width: int = 32, channels: int = 3) -> Pytree:
    """Fresh parameters matching the reference init scheme.

    - Convs: MSRA ``std = gain * sqrt(2 / fan_in)`` with per-op gains
      (conv0 gain 1.0, all others 0.1; src/network.rs:33,60-72).
    - Biases: zero (``init_fill(0.0)``, src/network.rs:34,38,50-52).
    - BeLU slopes: ``init_porque_no_los_dos()`` — p alternates 1, 0, 1, 0…
      across channels (src/network.rs:35,54-56; SURVEY.md §8.3).
    """
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    tree: Pytree = {}
    for name, shape in param_specs(factor, width, channels):
        if len(shape) == 4:
            c_out, kh, kw, c_in = shape
            fan_in = kh * kw * c_in
            std = _CONV_GAINS[name] * np.sqrt(2.0 / fan_in)
            w = rng.normal(0.0, std, size=shape).astype(np.float32)
            tree[name] = np.ascontiguousarray(w.transpose(1, 2, 3, 0))
        elif name.endswith("_belu"):
            p = np.zeros(shape, dtype=np.float32)
            p[0::2] = 1.0
            tree[name] = p
        else:
            tree[name] = np.zeros(shape, dtype=np.float32)
    return tree


def load_builtin(name: str, factor: int = 3) -> Pytree:
    """Load one of the three vendored weight sets by name."""
    if name not in BUILTIN_WEIGHTS:
        raise ValueError(f"unknown builtin weights {name!r}; choose from {BUILTIN_WEIGHTS}")
    import os
    with open(os.path.join(_builtin_dir(), f"{name}.rsr"), "rb") as f:
        return flat_to_pytree(decode_rsr(f.read()), factor)


def load_rsr_file(path: str, factor: int) -> Pytree:
    """Load a custom `.rsr` parameter file (reference `-c/--custom`)."""
    with open(path, "rb") as f:
        return flat_to_pytree(decode_rsr(f.read()), factor)


def save_rsr_file(path: str, tree: Pytree, factor: int) -> None:
    """Write a checkpoint in byte-compatible `.rsr` framing (src/main.rs:210-217)."""
    data = encode_rsr(pytree_to_flat(tree, factor))
    with open(path, "wb") as f:
        f.write(data)

"""High-level Python API.

>>> import rusty_sr_tpu
>>> hr = rusty_sr_tpu.upscale(img, weights="anime")          # (H,W,3) f32
>>> lr = rusty_sr_tpu.downscale(img)                          # gamma-correct
>>> params = rusty_sr_tpu.train_folder("photos/", steps=1000)
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from rusty_sr_tpu import params as params_lib

_PARAM_CACHE: dict = {}


def _resolve_params(weights: Union[str, dict], factor: int):
    if isinstance(weights, dict):
        return weights
    key = (weights, factor)
    if key not in _PARAM_CACHE:
        import jax.numpy as jnp
        if weights in params_lib.BUILTIN_WEIGHTS:
            tree = params_lib.load_builtin(weights, factor)
        else:
            tree = params_lib.load_rsr_file(weights, factor)
        _PARAM_CACHE[key] = {k: jnp.asarray(v) for k, v in tree.items()}
    return _PARAM_CACHE[key]


def upscale(image: np.ndarray, weights: Union[str, dict] = "imagenet",
            factor: int = 3, *, fast: bool = False, engine: str = "xla",
            tile: int = 242, chunk: Optional[int] = None) -> np.ndarray:
    """Upscale an (H,W,3) f32 sRGB image by `factor`.

    ``weights``: builtin name ('imagenet', 'imagenetlinear', 'anime'), a
    path to a `.rsr` file, or a param pytree.  ``fast`` switches the conv
    trunk to bf16 (≤2 u8-code deviation).  ``engine``: 'xla' (the product
    path), 'fused' (the Pallas trunk kernel — a kept-alive kernel-work
    vehicle, ~8x slower than the default), or 'int8' (the RETIRED
    quantised-trunk experiment: PERF.md probe59 measured +4.5% for ~8 dB,
    so it ships nowhere in the CLI; reachable here for quantisation
    research only).

    A uint8 image is accepted directly (and rides the u8 device-I/O fast
    path; the result is then uint8 too).  Float inputs must already be
    sRGB values in [0, 1] — out-of-range floats raise rather than silently
    producing garbage.
    """
    import jax.numpy as jnp
    from rusty_sr_tpu.parallel.tiling import tiled_sr

    tree = _resolve_params(weights, factor)
    image = np.asarray(image)
    if image.dtype == np.uint8 and engine in ("xla", "int8"):
        pass  # u8 end-to-end device path (4x less transfer, u8 out)
    else:
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        else:
            image = np.asarray(image, np.float32)
            # NaN compares False on both sides of a range check, so the
            # finiteness test must be explicit or NaN pixels sail through
            # the guard that exists to reject garbage.
            if image.size and not (np.isfinite(image).all()
                                   and image.min() >= -0.001
                                   and image.max() <= 1.001):
                raise ValueError(
                    "float input must be finite sRGB in [0, 1] (got range "
                    f"[{image.min():.3g}, {image.max():.3g}]); pass uint8 "
                    "pixels directly or divide by 255")
    return tiled_sr(tree, image, factor, tile=tile,
                    chunk=chunk, engine=engine,
                    compute_dtype=jnp.bfloat16 if fast else None)


def upscale_batch(images, weights: Union[str, dict] = "imagenet",
                  factor: int = 3, *, fast: bool = False,
                  tile: int = 242,
                  chunk: Optional[int] = None, mesh=None,
                  on_image_done=None, release_outputs: bool = False) -> list:
    """Upscale a list of images, batching tiles ACROSS images — the same
    driver the folder/watch CLI serving modes ride (per-dispatch fixed
    costs amortise over the whole set; the reference runs one process
    per image, src/main.rs:130-178).

    All images must share a dtype (all uint8 or all float; uint8 rides
    the u8 device-I/O path and returns uint8).  ``mesh``: shard each
    tile chunk over the mesh's 'data' axis (multi-chip serving; outputs
    byte-identical to single-device).  ``on_image_done(i, out)`` fires
    the moment image i finishes — while later tiles still compute — so
    encode/save work can overlap device compute; with
    ``release_outputs=True`` the returned list holds None for delivered
    images (bounded host memory on big sets).
    """
    import jax.numpy as jnp
    from rusty_sr_tpu.parallel.tiling import tiled_sr_batch
    tree = _resolve_params(weights, factor)
    return tiled_sr_batch(tree, [np.asarray(im) for im in images], factor,
                          tile=tile, chunk=chunk, mesh=mesh,
                          compute_dtype=jnp.bfloat16 if fast else None,
                          on_image_done=on_image_done,
                          release_outputs=release_outputs)


def upscale_bilinear(image: np.ndarray, factor: int = 3) -> np.ndarray:
    """Gamma-correct bilinear upscale (the reference's `-p bilinear`),
    through the fixed-shape tile path (zero recompiles across sizes).
    uint8 in => uint8 out; float in => float out."""
    from rusty_sr_tpu.parallel.tiling import tiled_simple
    return tiled_simple(np.asarray(image), factor, mode="bilinear")


def downscale(image: np.ndarray, factor: int = 3) -> np.ndarray:
    """Gamma-correct f x f mean downsample (the reference's `-d`),
    through the fixed-shape tile path (zero recompiles across sizes)."""
    from rusty_sr_tpu.parallel.tiling import tiled_simple
    img = np.asarray(image)
    h, w, _ = img.shape
    img = img[: h - h % factor, : w - w % factor]
    return tiled_simple(img, factor, mode="downsample")


def train_folder(folder: str, *, steps: Optional[int] = None,
                 factor: int = 3, recurse: bool = False,
                 start: Union[str, dict, None] = None,
                 param_file: Optional[str] = None,
                 linear_loss: bool = False, loss: str = "mse",
                 val_folder: Optional[str] = None, val_max: Optional[int] = None,
                 metrics_file: Optional[str] = None,
                 ckpt_dir: Optional[str] = None,
                 resume_from: Optional[str] = None,
                 amp: bool = False, precision: str = "highest",
                 trunk: str = "merged", batch_size: Optional[int] = None,
                 crop: Optional[int] = None, remat: bool = False,
                 steps_per_dispatch: Optional[int] = None,
                 data_workers: Optional[int] = None,
                 max_rss_gb: Optional[float] = None,
                 seed: int = 0):
    """Train on an image folder with the reference protocol; returns params.

    ``ckpt_dir``/``resume_from`` give resumable native checkpoints
    (params + Adam state + step); ``amp`` is the bf16 mixed-precision
    tier (~2x faster, PERF.md); ``precision`` 'highest' | 'high';
    ``trunk``/``batch_size`` select the training tier — the measured
    production recipe is ``trunk='packed', batch_size=32`` (~5,250
    samples/s on one v5e, quality within 0.04 dB of f32; PERF.md
    probe50/58/51) vs the reference defaults ('merged', 4);
    ``steps_per_dispatch`` scans N optimizer steps inside one device
    dispatch (default 10, clamped to the ckpt/val cadences);
    ``crop`` is the HR crop side (reference hardcodes 192,
    src/main.rs:187 — must be a multiple of the factor; even LR crop
    for the packed trunk); ``remat`` rematerialises the forward in the
    backward (jax.checkpoint) for large crops/batches;
    ``data_workers`` sizes the host decode/crop pool (default: CPU
    count, capped — see train.data.CropPipeline)."""
    from rusty_sr_tpu.train.data import CropPipeline, list_images
    from rusty_sr_tpu.train.loop import TrainConfig, train_loop
    from rusty_sr_tpu.utils.imageio import load_image

    if trunk not in ("merged", "flat", "packed"):
        raise ValueError(f"trunk must be merged/flat/packed, got {trunk!r}")
    cfg = TrainConfig(factor=factor, linear_loss=linear_loss, loss_kind=loss,
                      amp=amp, precision=precision, trunk=trunk)
    if batch_size is not None:
        if batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        cfg.batch_size = batch_size
    if steps_per_dispatch is not None:
        if steps_per_dispatch < 1:
            raise ValueError("steps_per_dispatch must be >= 1")
        cfg.steps_per_dispatch = steps_per_dispatch
    if crop is not None:
        if crop < factor or crop % factor:
            raise ValueError(f"crop must be a positive multiple of the "
                             f"factor {factor} (got {crop})")
        if trunk == "packed" and (crop // factor) % 2:
            raise ValueError(f"trunk='packed' needs an even LR crop "
                             f"(crop {crop} / factor {factor} is odd)")
        cfg.crop = crop
    cfg.remat = remat
    buf = CropPipeline(folder, recurse=recurse, crop=(cfg.crop, cfg.crop),
                       batch_size=cfg.batch_size, seed=seed,
                       workers=data_workers,
                       out_dtype=np.uint8)   # 4x less H2D; device /255

    start_tree = None
    if isinstance(start, str):
        start_tree = params_lib.load_rsr_file(start, factor)
    elif isinstance(start, dict):
        start_tree = start

    val_images = None
    if val_folder:
        files = list_images(val_folder, recurse)
        if val_max is not None:
            files = files[:val_max]
        val_images = [load_image(f) for f in files]

    def batches():
        while True:
            b = buf.next_batch()
            if b is None:
                return
            yield b

    try:
        return train_loop(cfg, batches(), start_params=start_tree,
                          param_file=param_file, val_images=val_images,
                          max_steps=steps, metrics_file=metrics_file,
                          native_ckpt_dir=ckpt_dir, resume_from=resume_from,
                          max_rss_gb=max_rss_gb,
                          seed=seed)
    finally:
        buf.close()

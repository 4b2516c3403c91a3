from rusty_sr_tpu.parallel.tiling import tiled_sr, HALO  # noqa: F401

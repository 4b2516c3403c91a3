from rusty_sr_tpu.utils.imageio import load_image, save_image, psnr  # noqa: F401

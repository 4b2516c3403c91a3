from rusty_sr_tpu.models.sr_net import (  # noqa: F401
    sr_apply,
    bilinear_apply,
    downsample_apply,
    make_lr_from_hr,
)

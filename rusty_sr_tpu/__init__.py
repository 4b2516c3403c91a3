"""rusty_sr_tpu — a TPU-native (JAX/XLA/Pallas) super-resolution framework.

A from-scratch rebuild of the capabilities of millardjn/rusty_sr (reference:
/root/reference, a Rust CLI over the `alumina` graph framework) designed
TPU-first: the alumina dataflow graph (reference src/network.rs:16-109)
becomes a pure jitted function; multi-writer node accumulation becomes `+`;
the sub-pixel `Expand` op becomes depth-to-space; convs run on the MXU in
NHWC/HWIO; large images run through a fixed-shape overlap-tile pipeline so
XLA never recompiles; training is optax Adam under `jax.value_and_grad`
with `shard_map` data parallelism over an ICI mesh.
"""

__version__ = "0.1.0"

from rusty_sr_tpu.params import (  # noqa: F401
    decode_rsr,
    encode_rsr,
    flat_to_pytree,
    pytree_to_flat,
    init_params,
    num_params,
    load_builtin,
    BUILTIN_WEIGHTS,
)
from rusty_sr_tpu.models.sr_net import (  # noqa: F401
    sr_apply,
    bilinear_apply,
    downsample_apply,
)
from rusty_sr_tpu.api import (  # noqa: F401
    upscale,
    upscale_batch,
    upscale_bilinear,
    downscale,
    train_folder,
)

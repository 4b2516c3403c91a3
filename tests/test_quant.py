"""Int8 trunk tier: quality bounds vs the exact path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import load_builtin, sr_apply
from rusty_sr_tpu.models.sr_net import merge_params
from rusty_sr_tpu.models.quant import quantize_trunk, sr_apply_q8
from rusty_sr_tpu.utils.imageio import load_image, to_u8, psnr


@pytest.fixture(scope="module")
def anime():
    return {k: jnp.asarray(v) for k, v in load_builtin("anime").items()}


def test_int8_quality_floor(anime):
    """Opt-in throughput tier: must stay >= 40 dB parity to the exact
    output (measured ~45 dB; visually transparent, but above the 0.05 dB
    Set14 budget — hence not the default fast mode)."""
    q = quantize_trunk(merge_params(anime))
    lr = load_image("/root/reference/docs/cartoon_lr.png")[None]
    out_q = np.asarray(jax.jit(lambda q_, x: sr_apply_q8(q_, x, 3))(
        q, jnp.asarray(lr))[0])
    out_f = np.asarray(jax.jit(lambda p, x: sr_apply(p, x, 3))(
        anime, jnp.asarray(lr))[0])
    db = psnr(to_u8(out_q) / 255.0, to_u8(out_f) / 255.0)
    assert db >= 40.0, f"int8 tier degraded: {db:.2f} dB vs exact"


def test_int8_weights_roundtrip(anime):
    q = quantize_trunk(merge_params(anime))
    for name in ("convA", "convB", "convC", "conv10"):
        wq = np.asarray(q[name + "_q"], np.int32)
        assert wq.min() >= -127 and wq.max() <= 127
        # dequantised weights close to original (per-channel 8-bit)
        w = np.asarray(merge_params(anime)[name], np.float32)
        back = wq * np.asarray(q[name + "_s"])
        rel = np.abs(back - w).max() / np.abs(w).max()
        assert rel < 0.005

"""Golden-image parity tests against the reference's published outputs.

SURVEY.md §8.8 fixture table.  The reference has no tests of its own
(§4); its README example images are the de-facto verification artifacts.
The anime fixture is the bit-exact-class gate (measured 102 dB here).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import load_builtin, sr_apply
from rusty_sr_tpu.models.sr_net import bilinear_apply
from rusty_sr_tpu.utils.imageio import load_image, to_u8, psnr

DOCS = "/root/reference/docs"


def _u8_psnr(out_f32, golden_path):
    gold = (load_image(golden_path) * 255).round().astype(np.uint8)
    ours = to_u8(out_f32)
    assert ours.shape == gold.shape
    return psnr(ours / 255.0, gold / 255.0), \
        np.abs(ours.astype(int) - gold.astype(int)).max()


def _run_sr(weights, lr_img):
    params = jax.tree.map(jnp.asarray, load_builtin(weights))
    out = jax.jit(lambda p, x: sr_apply(p, x, 3))(params, jnp.asarray(lr_img)[None])
    return np.asarray(out[0])


@pytest.fixture(scope="module")
def logo_lr():
    """`logo_lr` is not shipped; `logo_nn` is its exact nearest-neighbour 3x
    replication, so [::3,::3] losslessly recovers it (SURVEY.md §8.8)."""
    return load_image(f"{DOCS}/logo_nn.png")[::3, ::3]


def test_anime_cartoon_bit_exact_class():
    out = _run_sr("anime", load_image(f"{DOCS}/cartoon_lr.png"))
    db, maxerr = _u8_psnr(out, f"{DOCS}/cartoon_rsa.png")
    assert db >= 60.0, f"parity gate failed: {db:.2f} dB"
    assert maxerr <= 1


def test_imagenet_butterfly():
    out = _run_sr("imagenet", load_image(f"{DOCS}/butterfly_lr.png"))
    db, _ = _u8_psnr(out, f"{DOCS}/butterfly_rs.png")
    assert db >= 50.0, f"{db:.2f} dB"   # older weight revision: ~55 dB ceiling


def test_imagenet_logo(logo_lr):
    out = _run_sr("imagenet", logo_lr)
    db, _ = _u8_psnr(out, f"{DOCS}/logo_rs.png")
    assert db >= 50.0, f"{db:.2f} dB"


def test_bilinear_mode_logo(logo_lr):
    out = np.asarray(jax.jit(lambda x: bilinear_apply(x, 3))(jnp.asarray(logo_lr)[None])[0])
    db, _ = _u8_psnr(out, f"{DOCS}/logo_lin.png")
    assert db >= 50.0, f"{db:.2f} dB"


def test_imagenetlinear_weights_distinct():
    """No golden exists for imagenetlinear (the reference publishes no
    sample from it); pin that it loads, runs, and differs from imagenet."""
    lr = load_image(f"{DOCS}/cartoon_lr.png")
    a = _run_sr("imagenetlinear", lr)
    b = _run_sr("imagenet", lr)
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() > 1e-3


def test_nn_images_are_replications():
    """Sanity: the `_nn` fixtures really are nearest-neighbour x3 copies."""
    lr = load_image(f"{DOCS}/cartoon_lr.png")
    nn = load_image(f"{DOCS}/cartoon_nn.png")
    assert np.array_equal(np.repeat(np.repeat(lr, 3, 0), 3, 1), nn)

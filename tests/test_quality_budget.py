"""In-suite north-star quality gates (BASELINE.md budget; VERDICT r3 #6).

Real product weights at product settings (tile=242, u8 I/O, packed fast
tier) over ALL FOUR docs images, plus packed-tier gates at factors 2 and
4 on TRAINED weights (tests/fixtures/factor{2,4}.rsr — 3k steps on the
docs-derived training set, scripts/make_train_data.py; VERDICT r4 #8:
seeded-init weights exercise a narrower activation range than trained
ones, so the old 64.5 dB gate was a weaker discriminator).

Measured nominals (this protocol, CPU, round 4):

  factor 3 fidelity (fast vs exact): cartoon 60.89 | butterfly 63.34 |
    logo 63.90 | bank 63.69 dB; a 1-bf16-ulp-class perturbation of the
    packed 3x3 stage weights costs ~3.8-4 dB, so per-image gates ~2.3 dB
    under nominal have teeth at every image.
  factor 3 GT delta (exact - fast, self-supervised GT protocol):
    +0.003 .. +0.026 dB — all inside the 0.05 dB budget.
  factors 2/4 (TRAINED fixtures, round 5): fidelity 63.46/62.57 dB
    nominal, 57.17/57.01 perturbed — same separation class as the
    factor-3 real weights; GT delta inside budget.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu import params as params_lib
from rusty_sr_tpu.parallel.tiling import (HALO, _gather_u8,
                                          _tile_kernel_packed,
                                          packed_trunk_params, tiled_sr,
                                          trunk_params)
from rusty_sr_tpu.models.sr_net import make_lr_from_hr
from rusty_sr_tpu.utils.imageio import load_image, load_image_u8, psnr, to_u8

GT_BUDGET_DB = 0.05          # BASELINE.md north-star quality clause
DOCS = "/root/reference/docs/"

# per-image fidelity gates: ~2.3 dB under measured nominal, well inside
# the ~3.8-4 dB cost of a 1-ulp packed-weight regression (teeth test)
FIDELITY_GATES = {"cartoon": 58.0, "butterfly": 61.0,
                  "logo": 61.5, "bank": 61.3}
# LR input per image (logo_lr does not exist; logo_nn[::3,::3] recovers it)
LR_FILES = {"cartoon": "cartoon_lr.png", "butterfly": "butterfly_lr.png",
            "logo": "logo_nn.png", "bank": "bank_lr.png"}
# HR source per image for the self-supervised GT protocol
HR_FILES = {"cartoon": "cartoon_rsa.png", "butterfly": "butterfly_rs.png",
            "logo": "logo_rs.png", "bank": "bank_rs.png"}
FACTOR_FIDELITY_GATE = 60.5  # factors 2/4 TRAINED fixtures: nominal
#                              63.46/62.57, 1-ulp perturbed 57.17/57.01


def _load_lr(name: str) -> np.ndarray:
    img = load_image_u8(DOCS + LR_FILES[name])
    return img[::3, ::3] if name == "logo" else img


@pytest.fixture(scope="module")
def params():
    return {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}


@pytest.mark.parametrize("name", sorted(FIDELITY_GATES))
def test_packed_fast_tier_fidelity_real_weights(params, name):
    """Packed fast tier vs exact tier, real weights, product settings,
    every docs image (a butterfly-only or bank-only regression fails)."""
    lr = _load_lr(name)
    exact = tiled_sr(params, lr, 3, tile=242, chunk=2)
    fast = tiled_sr(params, lr, 3, tile=242, chunk=2,
                    compute_dtype=jnp.bfloat16)
    db = psnr(fast / 255.0, exact / 255.0)
    assert db >= FIDELITY_GATES[name], \
        f"{name} fast-tier fidelity {db:.2f} dB"


@pytest.mark.parametrize("name", sorted(HR_FILES))
def test_packed_fast_tier_gt_delta_budget(params, name):
    """Self-supervised GT protocol (the reference's own validation,
    src/main.rs:231-250): HR -> factor-pool -> u8 LR -> SR; the fast
    tier may cost at most 0.05 dB of real PSNR vs the exact tier —
    gated on every docs image."""
    hr = load_image(DOCS + HR_FILES[name])
    h, w, _ = hr.shape
    hr = hr[: h - h % 3, : w - w % 3]
    lr = to_u8(np.clip(
        np.asarray(make_lr_from_hr(jnp.asarray(hr)[None], 3)[0]), 0, 1))
    pe = psnr(np.clip(tiled_sr(params, lr, 3, tile=242, chunk=2) / 255.0,
                      0, 1), hr)
    pf = psnr(np.clip(tiled_sr(params, lr, 3, tile=242, chunk=2,
                               compute_dtype=jnp.bfloat16) / 255.0, 0, 1),
              hr)
    assert pe - pf <= GT_BUDGET_DB, f"{name} GT delta {pe - pf:+.4f} dB"


@pytest.mark.parametrize("factor", [2, 4])
def test_packed_tier_budget_other_factors(factor):
    """Factor-generic packed tier (the reference's TODO factor flag):
    fidelity + GT budget at factors 2 and 4 with TRAINED weights
    (vendored fixtures) — a factor-specific packed-kernel regression
    fails here even when factor 3 is clean, on realistic activation
    ranges."""
    import os
    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      f"factor{factor}.rsr")
    tree = {k: jnp.asarray(v)
            for k, v in params_lib.load_rsr_file(fx, factor).items()}
    lr = _load_lr("cartoon")
    exact = tiled_sr(tree, lr, factor, tile=242, chunk=2)
    fast = tiled_sr(tree, lr, factor, tile=242, chunk=2,
                    compute_dtype=jnp.bfloat16)
    db = psnr(fast / 255.0, exact / 255.0)
    assert db >= FACTOR_FIDELITY_GATE, \
        f"factor-{factor} fidelity {db:.2f} dB"

    hr = load_image(DOCS + "cartoon_rsa.png")
    h, w, _ = hr.shape
    hr = hr[: h - h % factor, : w - w % factor]
    lru = to_u8(np.clip(np.asarray(
        make_lr_from_hr(jnp.asarray(hr)[None], factor)[0]), 0, 1))
    pe = psnr(np.clip(tiled_sr(tree, lru, factor, tile=242,
                               chunk=2) / 255.0, 0, 1), hr)
    pf = psnr(np.clip(tiled_sr(tree, lru, factor, tile=242, chunk=2,
                               compute_dtype=jnp.bfloat16) / 255.0, 0, 1),
              hr)
    assert pe - pf <= GT_BUDGET_DB, \
        f"factor-{factor} GT delta {pe - pf:+.4f} dB"


@pytest.mark.parametrize("factor", [2, 3, 4])
def test_quality_gate_has_teeth(factor):
    """Deliberately injecting a 1-bf16-ulp-class error into the packed
    3x3 stage weights must fail the fidelity gate AT EVERY FACTOR —
    proving the gates would catch a new packed-kernel rounding
    regression (the class of bug XLA's excess-precision fold caused in
    round 2, PERF.md).  Measured drops: 60.9->57.1 (f3, real weights),
    63.46->57.17 / 62.57->57.01 (f2/f4, trained fixtures)."""
    lr = _load_lr("cartoon")
    if factor == 3:
        tree = {k: jnp.asarray(v)
                for k, v in load_builtin("imagenet").items()}
        gate = FIDELITY_GATES["cartoon"]
    else:
        import os
        fx = os.path.join(os.path.dirname(__file__), "fixtures",
                          f"factor{factor}.rsr")
        tree = {k: jnp.asarray(v)
                for k, v in params_lib.load_rsr_file(fx, factor).items()}
        gate = FACTOR_FIDELITY_GATE
    exact = tiled_sr(tree, lr, factor, tile=242, chunk=2)
    pp = packed_trunk_params(trunk_params(tree), jnp.bfloat16, factor)
    for key in ("WA", "WB", "WC"):
        w = pp[key].astype(jnp.float32) * (1.0 + 2.0 ** -8)
        pp[key] = w.astype(jnp.bfloat16)
    zt, et, mt = _gather_u8(lr, 242, HALO, 1, 1)
    res = np.asarray(_tile_kernel_packed(
        pp, jnp.asarray(zt), jnp.asarray(et), jnp.asarray(mt), factor,
        242, jnp.bfloat16))[0]
    pert = res[:lr.shape[0] * factor, :lr.shape[1] * factor]
    db = psnr(pert / 255.0, exact / 255.0)
    assert db < gate - 0.5, \
        f"factor-{factor} perturbation not detected ({db:.2f} dB) — " \
        "the gate has no teeth"


def test_long_run_artifact_is_reference_class():
    """The round-5 100k-step training artifact (artifacts/r5_long/
    trained_100k.rsr, PERF.md 'Reference training protocol at scale')
    loads through the standard .rsr path and beats bilinear by >= 8 dB
    on the HELD-OUT validation image (measured +9.7 dB on chip/CPU) —
    the committed proof that the trainer produces reference-class
    weights, not just a stable loss curve."""
    import os
    from rusty_sr_tpu.api import upscale_bilinear
    fx = os.path.join(os.path.dirname(__file__), "..",
                      "artifacts", "r5_long", "trained_100k.rsr")
    tree = {k: jnp.asarray(v)
            for k, v in params_lib.load_rsr_file(fx, 3).items()}
    hr = load_image(DOCS + "logo_rs.png")
    h, w, _ = hr.shape
    hr = hr[: h - h % 3, : w - w % 3]
    lr = to_u8(np.clip(
        np.asarray(make_lr_from_hr(jnp.asarray(hr)[None], 3)[0]), 0, 1))
    p_tr = psnr(np.clip(tiled_sr(tree, lr, 3, tile=242,
                                 chunk=2) / 255.0, 0, 1), hr)
    p_bl = psnr(np.clip(upscale_bilinear(lr, 3) / 255.0, 0, 1), hr)
    assert p_tr - p_bl >= 8.0, \
        f"trained {p_tr:.2f} dB vs bilinear {p_bl:.2f} (+{p_tr - p_bl:.2f})"

"""In-suite north-star quality gate (VERDICT r2 #3; BASELINE.md budget).

Real product weights at product settings (tile=242, u8 I/O, packed fast
tier) — not random init.  Measured on this protocol (scripts/qmeasure,
r3): nominal fidelity 60.91 dB, GT delta +0.0032 dB; a 1-bf16-ulp-class
perturbation of the packed 3x3 stage weights drops fidelity to 57.06 dB,
so the 58 dB gate has teeth: any packed-kernel quality regression of even
one rounding class fails the suite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import (HALO, _gather_u8,
                                          _tile_kernel_packed,
                                          packed_trunk_params, tiled_sr,
                                          trunk_params)
from rusty_sr_tpu.models.sr_net import make_lr_from_hr
from rusty_sr_tpu.utils.imageio import load_image, load_image_u8, psnr, to_u8

FIDELITY_GATE_DB = 58.0      # nominal 60.9; 1-ulp regression = 57.1
GT_BUDGET_DB = 0.05          # BASELINE.md north-star quality clause


@pytest.fixture(scope="module")
def params():
    return {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}


@pytest.fixture(scope="module")
def cartoon_u8():
    return load_image_u8("/root/reference/docs/cartoon_lr.png")


@pytest.fixture(scope="module")
def exact_out(params, cartoon_u8):
    return tiled_sr(params, cartoon_u8, 3, tile=242)


def test_packed_fast_tier_fidelity_real_weights(params, cartoon_u8,
                                                exact_out):
    """Packed fast tier vs exact tier, real weights, product settings."""
    fast = tiled_sr(params, cartoon_u8, 3, tile=242,
                    compute_dtype=jnp.bfloat16)
    db = psnr(fast / 255.0, exact_out / 255.0)
    assert db >= FIDELITY_GATE_DB, f"fast-tier fidelity {db:.2f} dB"


def test_packed_fast_tier_gt_delta_budget(params):
    """Self-supervised GT protocol (the reference's own validation,
    src/main.rs:231-250): HR -> factor-pool -> u8 LR -> SR; the fast
    tier may cost at most 0.05 dB of real PSNR vs the exact tier."""
    hr = load_image("/root/reference/docs/cartoon_rsa.png")
    h, w, _ = hr.shape
    hr = hr[: h - h % 3, : w - w % 3]
    lr = to_u8(np.clip(
        np.asarray(make_lr_from_hr(jnp.asarray(hr)[None], 3)[0]), 0, 1))
    pe = psnr(np.clip(tiled_sr(params, lr, 3, tile=242) / 255.0, 0, 1), hr)
    pf = psnr(np.clip(tiled_sr(params, lr, 3, tile=242,
                               compute_dtype=jnp.bfloat16) / 255.0, 0, 1),
              hr)
    assert pe - pf <= GT_BUDGET_DB, f"GT delta {pe - pf:+.4f} dB"


def test_quality_gate_has_teeth(params, cartoon_u8, exact_out):
    """Deliberately injecting a 1-bf16-ulp-class error into the packed
    3x3 stage weights must fail the fidelity gate — proving the gate
    would catch a new packed-kernel rounding regression (the class of
    bug XLA's excess-precision fold caused in round 2, PERF.md)."""
    pp = packed_trunk_params(trunk_params(params), jnp.bfloat16, 3)
    for key in ("WA", "WB", "WC"):
        w = pp[key].astype(jnp.float32) * (1.0 + 2.0 ** -8)
        pp[key] = w.astype(jnp.bfloat16)
    zt, et, mt = _gather_u8(cartoon_u8, 242, HALO, 1, 1)
    res = np.asarray(_tile_kernel_packed(
        pp, jnp.asarray(zt), jnp.asarray(et), jnp.asarray(mt), 3, 242,
        jnp.bfloat16))[0]
    pert = res[:cartoon_u8.shape[0] * 3, :cartoon_u8.shape[1] * 3]
    db = psnr(pert / 255.0, exact_out / 255.0)
    assert db < FIDELITY_GATE_DB - 0.5, \
        f"perturbation not detected ({db:.2f} dB) — the gate has no teeth"

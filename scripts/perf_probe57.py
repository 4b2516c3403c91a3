"""probe57: can the EXACT tier (default parity mode) go faster?

Two untested formulations of the exact/near-exact u8 tile kernel:

  1. PACKED-EXACT — the s2d packed trunk (pure re-indexing, identical
     products) run in f32 with Precision.HIGHEST im2col dots.  The fast
     tier's 2.3x win came from the emitter's super-linear K/N rate law
     (PERF.md); does that law survive the 6-pass f32 emulation?  FLOP
     budget says it must beat ~2.5x rate to win (packed inflates true
     FLOPs ~2.5x net over the flat merged form at HR-equal output).
  2. HIGH tier — the flat merged kernel with Precision.HIGH (3-pass
     bf16 emulation: drops only the lo*lo term, ~2^-32 relative) —
     half the dot passes of HIGHEST for error far below one u8 code.
     And the packed form of the same.

Correctness is gated ON CHIP against the production exact kernel
(`_tile_kernel`, compute_dtype=None) before any timing: max u8 code
diff on interior AND masked-edge synthetic tiles.

Protocol: probe54/56 class — chained fori inside one jit, every kernel
input derived from the loop carry, value-fetch sync, varied inputs per
timed round.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/perf_probe57.py
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def packed_exact_params(params, factor=3):
    """f32 packed weight tree (no bf16 splits): W0 keeps the u8-exact
    /256 trick, the bilinear base rides as plain f32 K rows of WD."""
    from rusty_sr_tpu.parallel.tiling import (_base_conv_weights,
                                              _conv0_s2d_weights,
                                              _s2d_conv_weights,
                                              trunk_params)
    p = trunk_params(params)
    n = p["f_bias"].shape[0]
    e = p["expand_bias"].shape[0]
    wd = jnp.asarray(_s2d_conv_weights(p["conv10"], [e]), jnp.float32)
    wb = jnp.asarray(_s2d_conv_weights(
        _base_conv_weights(factor) * (256.0 / 255.0), [e]), jnp.float32)
    out = {
        "W0": jnp.asarray(_conv0_s2d_weights(p["conv0"] * (256.0 / 255.0)),
                          jnp.float32),
        "WA": jnp.asarray(_s2d_conv_weights(p["convA"], [n, n, n]),
                          jnp.float32),
        "WB": jnp.asarray(_s2d_conv_weights(p["convB"], [n, n, e]),
                          jnp.float32),
        "WC": jnp.asarray(_s2d_conv_weights(p["convC"], [n, e]),
                          jnp.float32),
        "WD": jnp.concatenate([wd, wb], axis=2),
    }
    for k in ("f_bias", "f_belu", "l1_bias", "l1_belu", "l2_bias",
              "l2_belu", "l3_bias", "l3_belu", "expand_bias"):
        out[k] = jnp.tile(jnp.asarray(p[k], jnp.float32), 4)
    return out


@functools.partial(jax.jit, static_argnames=("factor", "tile", "precision"))
def kern_packed(pp, edge_tiles, mask_tiles, factor: int, tile: int,
                precision=lax.Precision.HIGHEST):
    """f32 packed tile kernel: same topology as `_tile_kernel_packed`,
    all dots f32 im2col at `precision`, zero tiles derived on device."""
    from rusty_sr_tpu.ops.activations import belu
    from rusty_sr_tpu.ops.conv import _conv_im2col
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
    from rusty_sr_tpu.parallel.tiling import HALO

    h = HALO
    nb, sh, sw, ci = edge_tiles.shape
    ph, pw = sh // 2, sw // 2
    n = pp["f_bias"].shape[0] // 4
    e = pp["expand_bias"].shape[0] // 4

    def pack(t):
        c = t.shape[-1]
        return t.reshape(nb, ph, 2, pw, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(nb, ph, pw, 4 * c)

    te8 = pack(edge_tiles).astype(jnp.float32) * (2.0 ** -8)
    m4 = pack(mask_tiles).astype(jnp.float32)
    t8 = te8 * jnp.repeat(m4, ci, axis=-1)

    def cv(t, W):
        return _conv_im2col(t, W, jnp.float32, precision)

    mN = jnp.repeat(m4, n, axis=-1)
    f_ = belu(cv(t8, pp["W0"]) + pp["f_bias"], pp["f_belu"]) * mN
    N = 4 * n
    a = cv(f_, pp["WA"])
    l1 = belu(a[..., :N] + pp["l1_bias"], pp["l1_belu"]) * mN
    b = cv(l1, pp["WB"])
    l2 = belu(a[..., N:2 * N] + b[..., :N] + pp["l2_bias"],
              pp["l2_belu"]) * mN
    c = cv(l2, pp["WC"])
    l3 = belu(a[..., 2 * N:3 * N] + b[..., N:2 * N] + c[..., :N]
              + pp["l3_bias"], pp["l3_belu"]) * mN
    d = cv(jnp.concatenate([l3, te8], -1), pp["WD"])
    total = (b[..., 2 * N:2 * N + 4 * e] + c[..., N:N + 4 * e]
             + d + pp["expand_bias"])
    tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5) \
        .astype(jnp.uint8)
    ex = tq.reshape(nb, ph, pw, 2, 2, e) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(nb, sh, sw, e)
    return depth_to_space(ex[:, h:h + tile, h:h + tile, :], factor)


@functools.partial(jax.jit, static_argnames=("factor", "tile", "precision"))
def kern_flat(p, zero_tiles, edge_tiles, mask_tiles, factor: int, tile: int,
              precision=lax.Precision.HIGH):
    """The production exact topology with a precision knob on the dots."""
    from rusty_sr_tpu.ops.activations import belu
    from rusty_sr_tpu.ops.conv import _conv_im2col
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
    from rusty_sr_tpu.ops.resize import bilinear_phases_cropped
    from rusty_sr_tpu.parallel.tiling import HALO

    h = HALO
    x = zero_tiles.astype(jnp.float32) * (1.0 / 255.0)
    ef = edge_tiles.astype(jnp.float32) * (1.0 / 255.0)
    m = mask_tiles.astype(jnp.float32)

    def cv(t, name):
        return _conv_im2col(t, p[name], jnp.float32, precision)

    n = p["f_bias"].shape[0]
    e = p["expand_bias"].shape[0]
    f_ = m * belu(cv(x, "conv0") + p["f_bias"], p["f_belu"])
    a = cv(f_, "convA")
    l1 = m * belu(a[..., :n] + p["l1_bias"], p["l1_belu"])
    b = cv(l1, "convB")
    l2 = m * belu(a[..., n:2 * n] + b[..., :n] + p["l2_bias"], p["l2_belu"])
    c = cv(l2, "convC")
    l3 = m * belu(a[..., 2 * n:3 * n] + b[..., n:2 * n] + c[..., :n]
                  + p["l3_bias"], p["l3_belu"])
    expand = (b[..., 2 * n:2 * n + e] + c[..., n:n + e] + cv(l3, "conv10")
              + p["expand_bias"])
    base_ph = bilinear_phases_cropped(ef, factor, h, h, tile)
    total = base_ph + expand[:, h:h + tile, h:h + tile, :]
    total = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
    return depth_to_space(total, factor).astype(jnp.uint8)


def main():
    from rusty_sr_tpu.utils.platform import ensure_device_or_respawn
    ensure_device_or_respawn()
    from rusty_sr_tpu import load_builtin
    from rusty_sr_tpu.parallel.tiling import _tile_kernel, trunk_params, HALO

    factor, tile = 3, 242
    side = tile + 2 * HALO
    raw = {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}
    params = trunk_params(raw)
    pex = packed_exact_params(raw, factor)
    rng = np.random.default_rng(0)
    HI, HST = lax.Precision.HIGH, lax.Precision.HIGHEST

    # ---- correctness vs the production exact kernel (B=4) -------------
    nb = 4
    edge = (rng.random((nb, side, side, 3)) * 255).astype(np.uint8)
    mask = np.ones((nb, side, side, 1), np.uint8)
    # tile 3: synthetic edge tile — valid region (side-5) x (side-9),
    # clamp-replicated edge values, mask 0 outside (production invariant:
    # zero_tiles == edge_tiles * mask bytewise).
    mask[3, side - 5:, :, :] = 0
    mask[3, :, side - 9:, :] = 0
    edge[3, side - 5:, :, :] = edge[3, side - 6:side - 5, :, :]
    edge[3, :, side - 9:, :] = edge[3, :, side - 10:side - 9, :]
    zero = edge * mask
    je, jm, jz = jnp.asarray(edge), jnp.asarray(mask), jnp.asarray(zero)

    ref = np.asarray(_tile_kernel(params, jz, je, jm, factor, tile,
                                  None, True, False))
    for name, out in (
        ("packed HIGHEST", kern_packed(pex, je, jm, factor, tile, HST)),
        ("packed HIGH   ", kern_packed(pex, je, jm, factor, tile, HI)),
        ("flat   HIGH   ", kern_flat(params, jz, je, jm, factor, tile, HI)),
        ("flat   HIGHEST", kern_flat(params, jz, je, jm, factor, tile, HST)),
    ):
        d = np.abs(np.asarray(out).astype(np.int16) - ref.astype(np.int16))
        frac = float((d > 0).mean())
        print(f"corr {name}: max code diff {int(d.max())}  "
              f"frac>0 {frac:.2e}", flush=True)

    # ---- honest chained timing ----------------------------------------
    def rate(make_body, batch, iters=4):
        z = jnp.asarray((rng.random((batch, side, side, 3)) * 255)
                        .astype(np.uint8))

        @jax.jit
        def chained(zz):
            return jax.lax.fori_loop(0, iters, make_body(batch), zz)

        int(chained(z)[0, 0, 0, 0])
        mpix = batch * (tile * factor) ** 2 / 1e6
        best = 0.0
        for r in range(3):
            zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
            jax.block_until_ready(zr)
            t0 = time.perf_counter()
            int(chained(zr)[0, 0, 0, 0])
            best = max(best, iters * mpix / (time.perf_counter() - t0))
        return best

    def body_prod(batch):
        # NOTE (ADVICE r3): the production invariant zero == edge * mask
        # is intentionally NOT held in these timing arms — throughput is
        # data-independent (same graph, same shapes), and deriving the
        # buffers from the carry is what keeps the protocol honest
        # (nothing loop-invariant to hoist).  Do not read outputs here
        # as production pixels.
        def body(i, c):
            e = jnp.bitwise_xor(c, jnp.uint8(1))
            mm = jnp.bitwise_or(c[:, :, :, :1] >> 7, jnp.uint8(1))
            out = _tile_kernel(params, c, e, mm, factor, tile,
                               None, True, False)
            return jnp.bitwise_xor(out[:, :side, :side, :], c)
        return body

    def body_packed(prec):
        def mk(batch):
            def body(i, c):
                e = jnp.bitwise_xor(c, jnp.uint8(1))
                mm = jnp.bitwise_or(c[:, :, :, :1] >> 7, jnp.uint8(1))
                out = kern_packed(pex, e, mm, factor, tile, prec)
                return jnp.bitwise_xor(out[:, :side, :side, :], c)
            return body
        return mk

    def body_flat(prec):
        def mk(batch):
            def body(i, c):
                e = jnp.bitwise_xor(c, jnp.uint8(1))
                mm = jnp.bitwise_or(c[:, :, :, :1] >> 7, jnp.uint8(1))
                out = kern_flat(params, c, e, mm, factor, tile, prec)
                return jnp.bitwise_xor(out[:, :side, :side, :], c)
            return body
        return mk

    arms = [
        ("prod exact HIGHEST B=24 (anchor)", body_prod, 24),
        ("packed HIGHEST B=24", body_packed(HST), 24),
        ("flat   HIGH    B=24", body_flat(HI), 24),
        ("packed HIGH    B=24", body_packed(HI), 24),
        ("packed HIGHEST B=48", body_packed(HST), 48),
        ("packed HIGH    B=48", body_packed(HI), 48),
    ]
    for label, mk, b in arms:
        print(f"{label}: {rate(mk, b):7.1f} MPix/s", flush=True)


if __name__ == "__main__":
    main()

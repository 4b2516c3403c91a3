"""probe59: int8 dots on the MXU-bound packed trunk (VERDICT r3 #2).

The measured int8 dead end (probe15, -10..-26%) was on the FLAT im2col
lowering: int8 patch bytes die in the relayouts.  The PACKED trunk is a
different regime — its stage dots run at 88-99% of bf16 MXU peak
(PERF.md), and v5e int8 MXU peak is ~2x bf16 (394 TOPS), so int8 stage
dots could in principle reach ~1,700-1,900 MPix/s.  This probe answers
the throughput question ONLY (quality would be the int8 ~54 dB class,
models/quant.py; a tier, never the default):

  Phase 1 — isolated stage conv at the WA shape (B,128,128,128) x
     (3,3,128,384): native bf16/f32-accum vs int8/int32-accum, chained.
  Phase 2 — full packed kernel with WA/WB/WC int8 (symmetric per-channel
     act scales, per-cout weight scales; W0/WD stay bf16 exactly as the
     production kernel) vs the production bf16 anchor, same honest
     carry-derived protocol as probe54.

Scales here are throughput-realistic placeholders (the epilogue work —
quant round/clip/cast per stage input, int32->f32 scale per output — is
what costs; the scale VALUES don't).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 7200 \
     python scripts/perf_probe59.py
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _sync(t):
    """Value-fetch sync (probe53: block_until_ready can return early)."""
    return int(t.ravel()[0])


def phase1():
    """Raw emitter ratio at the WA stage shape."""
    B, H, W, CI, CO, K = 32, 128, 128, 128, 384, 3
    iters = 30
    rng = np.random.default_rng(0)
    flops = 2.0 * B * H * W * (K * K * CI) * CO * iters

    def run(label, x0, w, accum, fold):
        @jax.jit
        def chained(x, w):
            def body(i, c):
                y = lax.conv_general_dilated(
                    c, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=accum)
                return fold(y)
            return lax.fori_loop(0, iters, body, x)

        out = chained(x0, w)
        _sync(out)  # compile + warm
        best = float("inf")
        for r in range(3):
            xr = jax.device_put((np.asarray(x0).astype(np.float32)
                                 + r + 1).astype(x0.dtype))
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            _sync(chained(xr, w))
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:18s} {flops / best / 1e12:7.2f} TOP/s  "
              f"{best / iters * 1e3:7.3f} ms/conv", flush=True)

    xb = jnp.asarray(rng.standard_normal((B, H, W, CI)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, K, CI, CO)), jnp.bfloat16)
    run("bf16->f32 native", xb, wb, jnp.float32,
        lambda y: y[..., :CI].astype(jnp.bfloat16) * jnp.bfloat16(1e-3))

    xi = jnp.asarray(rng.integers(-127, 128, (B, H, W, CI)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, (K, K, CI, CO)), jnp.int8)
    run("int8->int32 native", xi, wi, jnp.int32,
        lambda y: jnp.bitwise_and(y[..., :CI], 127).astype(jnp.int8))

    # int8 with the f32 dequant epilogue the real kernel needs
    sw = jnp.asarray(rng.random(CO) + 0.5, jnp.float32)
    run("int8+f32 epilogue", xi, wi, jnp.int32,
        lambda y: jnp.clip(jnp.round(
            (y.astype(jnp.float32) * sw)[..., :CI]), -127, 127
        ).astype(jnp.int8))


def _quantize_packed(ppf, pp16):
    """f32 packed weights -> int8 trunk-stage params (symmetric)."""
    q = {k: pp16[k] for k in pp16}           # W0/WD/biases from production
    for name in ("WA", "WB", "WC"):
        w = jnp.asarray(ppf[name], jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        q[name + "q"] = jnp.round(w / sw).astype(jnp.int8)
        q["s" + name] = sw
    for act in ("f", "l1", "l2"):
        q["inv_" + act] = jnp.full((128,), 16.0, jnp.float32)  # placeholder
    return q


@functools.partial(jax.jit, static_argnames=("factor", "tile"))
def kernel_q8(qp, zero_tiles, edge_tiles, mask_tiles, factor: int,
              tile: int):
    """_tile_kernel_packed with WA/WB/WC int8; W0/WD bf16 as production."""
    from rusty_sr_tpu.ops.activations import belu
    from rusty_sr_tpu.ops.conv import _conv_native
    from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
    from rusty_sr_tpu.parallel.tiling import HALO

    h = HALO
    cd = jnp.bfloat16
    nb, sh, sw_, ci = edge_tiles.shape
    ph, pw = sh // 2, sw_ // 2
    n = qp["f_bias"].shape[0] // 4
    e = qp["expand_bias"].shape[0] // 4

    def pack(t):
        c = t.shape[-1]
        return t.reshape(nb, ph, 2, pw, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(nb, ph, pw, 4 * c)

    def quant(x, inv_s):
        return jnp.clip(jnp.round(x * inv_s), -127, 127).astype(jnp.int8)

    def q8cv(t, name):
        acc = lax.conv_general_dilated(
            t, qp[name + "q"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * qp["s" + name]).astype(cd)

    te8 = pack(edge_tiles).astype(cd) * jnp.asarray(2.0 ** -8, cd)
    t8 = pack(zero_tiles).astype(cd) * jnp.asarray(2.0 ** -8, cd)
    m4 = pack(mask_tiles).astype(jnp.float32)
    o = _conv_native(jnp.concatenate([t8, t8], -1), qp["W0"],
                     jnp.float32, None)
    mN = jnp.repeat(m4, n, axis=-1)
    f_ = belu(o + qp["f_bias"], qp["f_belu"]) * mN      # f32
    a = q8cv(quant(f_, qp["inv_f"]), "WA")

    def up(t):
        return t.astype(jnp.float32)

    N = 4 * n
    l1 = belu(up(a[..., :N]) + qp["l1_bias"], qp["l1_belu"]) * mN
    b = q8cv(quant(l1, qp["inv_l1"]), "WB")
    l2 = belu(up(a[..., N:2 * N]) + up(b[..., :N]) + qp["l2_bias"],
              qp["l2_belu"]) * mN
    c = q8cv(quant(l2, qp["inv_l2"]), "WC")
    l3 = (belu(up(a[..., 2 * N:3 * N]) + up(b[..., N:2 * N])
               + up(c[..., :N]) + qp["l3_bias"], qp["l3_belu"])
          * mN).astype(cd)
    d = _conv_native(jnp.concatenate([l3, te8, te8], -1), qp["WD"],
                     jnp.float32, None)
    total = (up(b[..., 2 * N:2 * N + 4 * e]) + up(c[..., N:N + 4 * e])
             + d + qp["expand_bias"])
    tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5) \
        .astype(jnp.uint8)
    ex = tq.reshape(nb, ph, pw, 2, 2, e) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(nb, sh, sw_, e)
    return depth_to_space(ex[:, h:h + tile, h:h + tile, :], factor)


def phase2():
    from rusty_sr_tpu import load_builtin
    from rusty_sr_tpu.parallel.tiling import (_tile_kernel_packed,
                                              packed_trunk_params,
                                              trunk_params, HALO)

    factor, tile = 3, 242
    side = tile + 2 * HALO
    params = trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
    pp16 = packed_trunk_params(params, jnp.bfloat16)
    ppf = packed_trunk_params(params, jnp.float32)
    qp = _quantize_packed(ppf, pp16)
    rng = np.random.default_rng(0)

    def rate(run, batch, iters=20):
        z = jnp.asarray((rng.random((batch, side, side, 3)) * 255)
                        .astype(np.uint8))

        @jax.jit
        def chained(zz):
            def body(i, c):
                e = jnp.bitwise_xor(c, jnp.uint8(1))
                mm = jnp.bitwise_or(c[:, :, :, :1] >> 7, jnp.uint8(1))
                out = run(c, e, mm)
                return jnp.bitwise_xor(out[:, :side, :side, :], c)
            return jax.lax.fori_loop(0, iters, body, zz)

        int(chained(z)[0, 0, 0, 0])  # compile + warm, value-fetch sync
        mpix = batch * (tile * factor) ** 2 / 1e6
        best, best_ms = 0.0, float("inf")
        for r in range(3):
            zr = jnp.asarray((np.asarray(z) + r + 1).astype(np.uint8))
            jax.block_until_ready(zr)
            t0 = time.perf_counter()
            int(chained(zr)[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            best = max(best, iters * mpix / dt)
            best_ms = min(best_ms, dt / iters * 1000)
        return best, best_ms

    run16 = lambda z, e, m: _tile_kernel_packed(  # noqa: E731
        pp16, z, e, m, factor, tile, jnp.bfloat16)
    runq8 = lambda z, e, m: kernel_q8(qp, z, e, m, factor, tile)  # noqa: E731

    for b in (96, 112):
        r, ms = rate(run16, b)
        print(f"  bf16 anchor B={b:4d}  {r:8.1f} MPix/s  {ms:8.2f} ms",
              flush=True)
    for b in (96, 112, 128, 144):
        r, ms = rate(runq8, b)
        print(f"  int8 packed B={b:4d}  {r:8.1f} MPix/s  {ms:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    from rusty_sr_tpu.utils.platform import ensure_device_or_respawn
    ensure_device_or_respawn()
    print("phase 1: isolated WA-shape stage conv", flush=True)
    phase1()
    print("phase 2: full packed kernel", flush=True)
    phase2()

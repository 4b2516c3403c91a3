"""Probe 20: honest per-stage cost profile of the PRODUCT tile kernel.

The round-1/2 cost model (CLAUDE.md: "d2s ~2.8ms, phases-concat ~2.3ms,
stage-A dot ~2.9ms...") came from scripts/profile_net.py-style single
dispatches; on this tunneled backend those sit on a ~30 ms round-trip
floor, so the breakdown may be fiction.  This probe times PREFIXES of the
exact _tile_kernel pipeline (u8 I/O, bf16 trunk, tile 242 / batch 24 —
the shipped bench configuration) with chained in-jit iterations; the
successive differences are trustworthy stage costs.

Section 2 dissects the 3x3 im2col stage — the biggest expected line item:
production im2col dot vs native conv vs raw-dot speed of light at the
same shape, and the N=91-vs-96 lane-padding question for convB.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.parallel.tiling import trunk_params, HALO
from rusty_sr_tpu.ops.activations import belu
from rusty_sr_tpu.ops.conv import conv2d_same, _conv_native
from rusty_sr_tpu.ops.pixel_shuffle import depth_to_space
from rusty_sr_tpu.ops.resize import bilinear_phases

B, TILE, F = 24, 242, 3
H = HALO
SIDE = TILE + 2 * H
CD = jnp.bfloat16
ITERS = 10

params = trunk_params(
    {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()})
rng = np.random.default_rng(0)


def stages(z8, m, nstage):
    """Prefix nstage of the exact _tile_kernel u8/bf16 pipeline."""
    p = params
    t8 = z8.astype(CD) * jnp.asarray(2.0 ** -8, CD)
    w0 = (p["conv0"] * (256.0 / 255.0)).astype(CD)
    x0 = _conv_native(t8, w0, jnp.float32, None)
    n, e27 = 32, 27
    f_ = m * belu(x0 + p["f_bias"], p["f_belu"])
    if nstage == 1:
        return f_

    def cv(t, name, native=False):
        w = p[name].astype(CD)
        t = t.astype(CD)
        if native:
            return _conv_native(t, w, jnp.float32, None)
        return conv2d_same(t, w)

    a = cv(f_, "convA", native=True)
    if nstage == 2:
        return a
    l1 = m * belu(a[..., :n] + p["l1_bias"], p["l1_belu"])
    b = cv(l1, "convB")
    if nstage == 3:
        return b
    l2 = m * belu(a[..., n:2 * n] + b[..., :n] + p["l2_bias"], p["l2_belu"])
    c = cv(l2, "convC")
    if nstage == 4:
        return c
    l3 = m * belu(a[..., 2 * n:3 * n] + b[..., n:2 * n] + c[..., :n]
                  + p["l3_bias"], p["l3_belu"])
    d = cv(l3, "conv10")
    if nstage == 5:
        return d
    expand = b[..., 2 * n:2 * n + e27] + c[..., n:n + e27] + d \
        + p["expand_bias"]
    ef = z8.astype(jnp.float32) * (1.0 / 255.0)
    base_ph = bilinear_phases(ef, F)
    total = base_ph[:, H:H + TILE, H:H + TILE, :] + \
        expand[:, H:H + TILE, H:H + TILE, :].astype(jnp.float32)
    tq = jnp.floor(jnp.clip(total, 0.0, 1.0) * 255.0 + 0.5)
    if nstage == 6:
        return tq
    return depth_to_space(tq, F).astype(jnp.uint8)


def time_chained(name, one, x0, extra=""):
    """ITERS chained invocations of one(x) inside a single jit."""
    def body(i, carry):
        xx, s = carry
        out = one(xx)
        # full-tensor reduction: XLA cannot slice it away (a [0]-element
        # dependency could let the simplifier push a slice through the
        # dot and skip most of the work); the reduce fuses into the
        # producer so it adds no HBM traffic of its own
        d = jnp.max(out)
        xx = xx.at[(0,) * xx.ndim].add(d.astype(xx.dtype))
        return xx, s + d.astype(jnp.float32)

    @jax.jit
    def loop(xx):
        return lax.fori_loop(0, ITERS, body, (xx, jnp.float32(0.0)))

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        comp = time.perf_counter() - t0
        best = 1e30
        for r in range(3):
            xr = (np.asarray(x0) + r + 1).astype(np.asarray(x0).dtype)
            xr = jnp.asarray(xr)
            jax.block_until_ready(xr)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(xr))
            best = min(best, time.perf_counter() - t0)
        per = best / ITERS
        print(f"{name:12s}: {per * 1e3:7.2f} ms/iter "
              f"(compile {comp:.0f}s){extra}", flush=True)
        return per
    except Exception as e:
        print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def section1():
    print(f"== prefix profile of _tile_kernel (B={B}, tile={TILE}, u8/bf16)",
          flush=True)
    z8 = jnp.asarray((rng.random((B, SIDE, SIDE, 3)) * 255).astype(np.uint8))
    m = jnp.asarray(np.ones((B, SIDE, SIDE, 1), np.float32))
    labels = ["conv0+belu", "+convA(nat)", "+l1+convB", "+l2+convC",
              "+l3+conv10", "+base+quant", "+d2s (full)"]
    prev = 0.0
    for ns, lab in enumerate(labels, start=1):
        per = time_chained(f"S{ns}", lambda zz, ns=ns: stages(zz, m, ns), z8,
                           extra=f"  [{lab}]")
        if per is not None:
            print(f"{'':12s}  delta {1e3 * (per - prev):+7.2f} ms",
                  flush=True)
            prev = per
    useful = B * (TILE * F) ** 2 / 1e6
    if prev:
        print(f"full-kernel anchor: {useful / prev:.1f} useful HR MPix/s "
              f"(bench says ~487)", flush=True)


def section2():
    print("== 3x3 stage dissection (B=24, 256^2, CIN=32, bf16)", flush=True)
    xi = jnp.asarray(rng.random((B, 256, 256, 32)), CD)
    gf = lambda co: 2 * B * 256 * 256 * 288 * co / 1e9  # noqa: E731

    for co in (96, 91):
        w3 = jnp.asarray(rng.random((3, 3, 32, co)) - 0.5, CD)
        per = time_chained(f"im2col n{co}", lambda xx, w3=w3: conv2d_same(xx, w3),
                           xi)
        if per:
            print(f"{'':12s}  {gf(co) / per / 1e3:.1f} TFLOP/s", flush=True)
        per = time_chained(f"native n{co}",
                           lambda xx, w3=w3: _conv_native(xx, w3, jnp.float32,
                                                          None), xi)
        if per:
            print(f"{'':12s}  {gf(co) / per / 1e3:.1f} TFLOP/s", flush=True)

    # 3x3 expressed as a zero-padded 5x5 native conv (the convA emitter
    # is fast — does the win come from the 5x5 shape?)
    w3 = jnp.asarray(rng.random((3, 3, 32, 96)) - 0.5, CD)
    w5 = jnp.zeros((5, 5, 32, 96), CD).at[1:4, 1:4].set(w3)
    per = time_chained("as5x5 nat", lambda xx: _conv_native(xx, w5,
                                                            jnp.float32, None),
                       xi)
    if per:
        print(f"{'':12s}  {gf(96) / per / 1e3:.1f} TFLOP/s (useful flops)",
              flush=True)

    # raw-dot speed of light at the im2col shape (patches pre-built)
    xp = jnp.asarray(rng.random((B, 256, 256, 288)), CD)
    wf = jnp.asarray(rng.random((288, 96)) - 0.5, CD)
    per = time_chained("rawdot 288", lambda xx: jnp.dot(
        xx, wf, preferred_element_type=jnp.float32), xp)
    if per:
        print(f"{'':12s}  {gf(96) / per / 1e3:.1f} TFLOP/s", flush=True)

    # convA anchor: how fast is the native 5x5 stage really?
    wa = jnp.asarray(rng.random((5, 5, 32, 96)) - 0.5, CD)
    per = time_chained("convA nat", lambda xx: _conv_native(xx, wa,
                                                            jnp.float32, None),
                       xi)
    if per:
        gfa = 2 * B * 256 * 256 * 800 * 96 / 1e9
        print(f"{'':12s}  {gfa / per / 1e3:.1f} TFLOP/s", flush=True)

    # convA as im2col (the round-1 measurement said native wins — confirm
    # with honest timing)
    per = time_chained("convA im2c", lambda xx: conv2d_same(xx, wa), xi)
    if per:
        gfa = 2 * B * 256 * 256 * 800 * 96 / 1e9
        print(f"{'':12s}  {gfa / per / 1e3:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    section1()
    section2()

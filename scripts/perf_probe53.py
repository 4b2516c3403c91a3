"""probe53: when does block_until_ready actually wait on this backend?

probe sequence (discovered while rewriting train_bench): a chained
50x4096^2-matmul scan "completed" in 0.5 ms by block_until_ready —
physically impossible (6.9 TFLOP, and below even the ~30 ms dispatch
round-trip floor) — yet the SAME program timed honestly (~85 ms) in a
process whose warmup had fetched one value from the executable's
output.  Hypothesis: block_until_ready on an output whose executable
has never had a value fetched returns early; the first fetch flips the
client into honest-sync mode.

This matters beyond train_bench: bench.py (the headline artifact) and
probe47 (the training table) both time with block_until_ready and never
fetch values.  Here each protocol is timed BOTH ways on the same warm
executable:

  A. block-only timing, no prior fetch (the round-2/3 protocol)
  B. after one np.asarray() fetch of a prior result, block-only timing

and for the packed inference kernel additionally
  C. timing where each round ends with a 1-element value fetch

If A==B==C the existing numbers stand.  If A < B==C, every block-only
number measured before the first fetch is fiction and bench.py needs a
warmup fetch.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed_rounds(make_input, run, rounds=3):
    outs = []
    for r in range(rounds):
        x = jax.block_until_ready(make_input(r))
        t0 = time.perf_counter()
        y = run(x)
        jax.block_until_ready(y)
        outs.append((time.perf_counter() - t0, y))
    return outs


def matmul_case():
    N, L = 4096, 50
    flops = 2 * N**3 * L

    def f(x):
        def body(c, _):
            return jnp.tanh(c @ c) + 1e-3, ()
        y, _ = lax.scan(body, x, None, length=L)
        return y

    fn = jax.jit(f)
    rng = np.random.default_rng(0)
    mk = lambda r: jnp.asarray(rng.random((N, N), np.float32))  # noqa: E731
    jax.block_until_ready(fn(mk(0)))  # compile
    a = timed_rounds(mk, fn)
    print("matmul  A (no fetch yet): " +
          " ".join(f"{dt:.4f}s" for dt, _ in a), flush=True)
    _ = np.asarray(a[-1][1])  # first value fetch from this executable
    b = timed_rounds(mk, fn)
    print("matmul  B (post fetch):   " +
          " ".join(f"{dt:.4f}s" for dt, _ in b) +
          f"   ({flops / min(dt for dt, _ in b) / 1e12:.1f} TFLOP/s)",
          flush=True)


def packed_case():
    from rusty_sr_tpu import load_builtin
    from rusty_sr_tpu.parallel.tiling import (_tile_kernel_packed,
                                              packed_trunk_params,
                                              trunk_params, HALO)
    factor, tile, batch, iters = 3, 242, 112, 20
    side = tile + 2 * HALO
    params = packed_trunk_params(trunk_params(
        {k: jnp.asarray(v) for k, v in load_builtin("imagenet").items()}))
    rng = np.random.default_rng(0)
    m = jnp.asarray(np.ones((batch, side, side, 1), np.uint8))

    def one(zz):
        out = _tile_kernel_packed(params, zz, zz, m, factor, tile,
                                  jnp.bfloat16)
        return jnp.bitwise_xor(out[:, :side, :side, :], zz)

    @jax.jit
    def chained(zz):
        return lax.fori_loop(0, iters, lambda i, c: one(c), zz)

    mk = lambda r: jnp.asarray((rng.random((batch, side, side, 3))  # noqa
                                * 255).astype(np.uint8))
    useful = batch * (tile * factor) ** 2 / 1e6
    jax.block_until_ready(chained(mk(0)))  # compile
    a = timed_rounds(mk, chained)
    print("packed  A (no fetch yet): " +
          " ".join(f"{iters * useful / dt:7.1f}" for dt, _ in a) +
          " MPix/s", flush=True)
    _ = np.asarray(a[-1][1][0, 0, 0, 0])  # first value fetch
    b = timed_rounds(mk, chained)
    print("packed  B (post fetch):   " +
          " ".join(f"{iters * useful / dt:7.1f}" for dt, _ in b) +
          " MPix/s", flush=True)
    c = []
    for r in range(3):
        x = jax.block_until_ready(mk(10 + r))
        t0 = time.perf_counter()
        y = chained(x)
        _ = np.asarray(y[0, 0, 0, 0])   # value fetch inside the timing
        c.append(time.perf_counter() - t0)
    print("packed  C (fetch-timed):  " +
          " ".join(f"{iters * useful / dt:7.1f}" for dt in c) +
          " MPix/s", flush=True)


def main():
    from rusty_sr_tpu.utils.platform import ensure_device_or_respawn
    ensure_device_or_respawn()
    matmul_case()
    packed_case()


if __name__ == "__main__":
    main()

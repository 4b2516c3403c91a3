"""2D-dot (reshape) variant of the fused trunk on the 3D grid."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from rusty_sr_tpu import load_builtin
from rusty_sr_tpu.ops.pallas.trunk import fused_trunk, pack_trunk_weights, HALO

BATCH, S, FACTOR, ITERS = 16, 256, 3, 20
HR_MPIX = BATCH * S * S * FACTOR * FACTOR / 1e6
h = HALO

def timed(label, fn, x):
    @jax.jit
    def chained(b):
        def body(i, c):
            e = fn(c)
            r = jnp.pad(e[..., :3] * 1e-6, ((0,0),(h,h),(h,h),(0,0)))
            return c + r
        return lax.fori_loop(0, ITERS, body, b)
    try:
        t0 = time.perf_counter(); jax.block_until_ready(chained(x))
        comp = time.perf_counter() - t0
        best = 1e30
        for r in range(3):
            xr = x * (1.0 + 1e-4*(r+1)); jax.block_until_ready(xr)
            t0 = time.perf_counter(); jax.block_until_ready(chained(xr))
            best = min(best, (time.perf_counter()-t0)/ITERS)
        print(f"{label:40s} {best*1e3:8.2f} ms  {HR_MPIX/best:8.1f} MPix/s (compile {comp:.0f}s)", flush=True)
    except Exception as ex:
        s = str(ex); i = s.find("Scoped"); j = s.find("Mosaic")
        print(f"{label:40s} FAILED: {s[i:i+120] if i>=0 else (s[j:j+120] if j>=0 else s[:120])}", flush=True)

params = {k: jnp.asarray(v) for k,v in load_builtin("imagenet").items()}
packed = pack_trunk_weights(params, FACTOR)
x = jnp.asarray(np.random.default_rng(0).random((BATCH, S+2*h, S+2*h, 3), dtype=np.float32))
for rh, vm in ((8, 0), (16, 64), (32, 96)):
    timed(f"2Ddot rh={rh} vmem={vm}", lambda c, rh=rh, vm=vm: fused_trunk(
        packed, c, None, FACTOR, rh=rh, vmem_mb=vm, rank3=False), x)

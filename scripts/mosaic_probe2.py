"""Round-2 kernel recipe validation: K-major patch scratch primitives.

(a) stores into (K, rows, cols) scratch at K offsets (leading-dim aligned)
(b) lhs-transposed matmul: dot_general contracting dim 0 of (K, M)
(c) reshape (K, rows, 128) -> (K, rows*128) when cols == one vreg width
(d) end-to-end mini conv stage in K-major form vs reference
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, CIN, COUT = 16, 128, 32, 96
K = 9 * CIN
rng = np.random.default_rng(0)
x_np = rng.random((R + 2, C + 2, CIN)).astype(np.float32)
w_np = rng.random((K, COUT)).astype(np.float32)
x = jnp.asarray(x_np, jnp.bfloat16)
w = jnp.asarray(w_np, jnp.bfloat16)


def run(name, kernel, out_shape, scratch=None, check=None):
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch or [],
        )(x, w)
        jax.block_until_ready(y)
        msg = "OK"
        if check is not None:
            err = float(np.abs(np.asarray(y, np.float32) - check).max())
            msg = f"OK maxerr={err:.4f}"
        print(f"{name}: {msg}", flush=True)
    except Exception as e:  # noqa: BLE001
        s = str(e)
        i = s.find("Mosaic")
        print(f"{name}: FAIL {s[i:i+160] if i>=0 else s[:160]}", flush=True)


def k_store_kmajor(x_ref, w_ref, o_ref, pat_ref):
    for dy in range(3):
        for dx in range(3):
            g = dy * 3 + dx
            pat_ref[g * CIN:(g + 1) * CIN, :, :] = jnp.transpose(
                x_ref[dy:dy + R, dx:dx + C, :], (2, 0, 1))
    o_ref[...] = pat_ref[:, 0, :].astype(jnp.float32)


def k_lhsT_dot(x_ref, w_ref, o_ref, pat_ref):
    for dy in range(3):
        for dx in range(3):
            g = dy * 3 + dx
            pat_ref[g * CIN:(g + 1) * CIN, :, :] = jnp.transpose(
                x_ref[dy:dy + R, dx:dx + C, :], (2, 0, 1))
    pat = pat_ref[...].reshape(K, R * C)
    out = lax.dot_general(pat, w_ref[...],
                          dimension_numbers=(((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    o_ref[...] = out


def main():
    # reference conv result for (d): out[m, o] = sum_k pat[k, m] * w[k, o]
    pat_ref = np.zeros((K, R, C), np.float32)
    xb = np.asarray(x, np.float32)
    for dy in range(3):
        for dx in range(3):
            g = dy * 3 + dx
            pat_ref[g * CIN:(g + 1) * CIN] = xb[dy:dy + R, dx:dx + C, :
                                                ].transpose(2, 0, 1)
    want = pat_ref.reshape(K, R * C).T.astype(np.float32) @ \
        np.asarray(w, np.float32)

    run("a) K-major stores (+transpose slice)", k_store_kmajor,
        jax.ShapeDtypeStruct((K, C), jnp.float32),
        scratch=[pltpu.VMEM((K, R, C), jnp.bfloat16)])
    run("b) lhs-T dot over K-major patches", k_lhsT_dot,
        jax.ShapeDtypeStruct((R * C, COUT), jnp.float32),
        scratch=[pltpu.VMEM((K, R, C), jnp.bfloat16)],
        check=want.reshape(R * C, COUT))


if __name__ == "__main__":
    main()

"""Probe which Mosaic lowerings exist on this libtpu for the patch-build
options: (1) reshape of offset slices, (2) scratch store/readback,
(3) rank-3 dot_general, (4) concat after scratch roundtrip."""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, CIN, COUT = 24, 136, 32, 96
x_np = np.random.default_rng(0).random((R + 4, C + 4, CIN)).astype(np.float32)
w_np = np.random.default_rng(1).random((CIN, COUT)).astype(np.float32)
x = jnp.asarray(x_np, jnp.bfloat16)
w = jnp.asarray(w_np, jnp.bfloat16)


def run(name, kernel, scratch=None, out_shape=None):
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=out_shape or jax.ShapeDtypeStruct((R * C, COUT), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch or [],
        )(x, w)
        jax.block_until_ready(y)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        s = str(e)
        i = s.find("Mosaic")
        print(f"{name}: FAIL {s[i:i+160] if i>=0 else s[:160]}", flush=True)


def k_reshape(x_ref, w_ref, o_ref):
    v = x_ref[1:1 + R, 2:2 + C, :]          # offset slice
    v2 = v.reshape(R * C, CIN)               # merge leading dims
    o_ref[...] = jnp.dot(v2, w_ref[...], preferred_element_type=jnp.float32)


def k_scratch(x_ref, w_ref, o_ref, pat_ref):
    pat_ref[0:R, 0:C, :] = x_ref[1:1 + R, 2:2 + C, :]   # store w/ relayout
    v2 = pat_ref[...].reshape(R * C, CIN)
    o_ref[...] = jnp.dot(v2, w_ref[...], preferred_element_type=jnp.float32)


def k_rank3(x_ref, w_ref, o_ref):
    v = x_ref[1:1 + R, 2:2 + C, :]
    out = jax.lax.dot_general(v, w_ref[...],
                              dimension_numbers=(((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = out


def k_scratch_concat(x_ref, w_ref, o_ref, pat_ref):
    # store two shifted slices into a K=64 scratch, then one dot
    pat_ref[0:R, 0:C, 0:CIN] = x_ref[0:R, 0:C, :]
    pat_ref[0:R, 0:C, CIN:2 * CIN] = x_ref[2:2 + R, 3:3 + C, :]
    v2 = pat_ref[...].reshape(R * C, 2 * CIN)
    o_ref[...] = jnp.dot(v2, jnp.concatenate([w_ref[...], w_ref[...]], 0),
                         preferred_element_type=jnp.float32)


run("reshape-offset-slice", k_reshape)
run("scratch-store", k_scratch,
    scratch=[pltpu.VMEM((R, C, CIN), jnp.bfloat16)])
run("rank3-dot", k_rank3,
    out_shape=jax.ShapeDtypeStruct((R, C, COUT), jnp.float32))
run("scratch-2slice-concatK", k_scratch_concat,
    scratch=[pltpu.VMEM((R, C, 2 * CIN), jnp.bfloat16)])

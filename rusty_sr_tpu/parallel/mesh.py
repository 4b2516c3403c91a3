"""Device-mesh parallelism: DP training + sharded batch/tile inference.

The reference is strictly single-process/single-device (SURVEY.md §2.4);
the parallelism here is the TPU-native replacement set that this workload
motivates, built on `jax.sharding.Mesh` + jit shardings so XLA inserts the
collectives (gradient all-reduce, halo exchange for spatially-sharded
convs) over ICI:

- ``data`` axis: batch data-parallelism (tiles at inference, crops at
  training; gradient psum at training).
- ``spatial`` axis: splits the image H dimension inside a batch element;
  GSPMD spatially partitions the convs and exchanges halos over ICI.
  This is the reference workload's analogue of sequence parallelism
  (SURVEY.md §5 "long-context" row).
- ``model`` axis: tensor parallelism — conv output channels (and the
  matching bias/BeLU vectors, gradients, and Adam moments) shard over
  the axis, so per-chip parameter/optimizer memory scales down with the
  mesh; XLA inserts the activation all-gathers.  At this model's size it
  exists to prove the axis composes (dp x sp x tp in one jitted step),
  not because 130 k params need it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rusty_sr_tpu.models.sr_net import sr_apply


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """A (data, spatial, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_spatial * n_model)
    need = n_data * n_spatial * n_model
    # n_data >= 1 keeps the inferred case from building a zero-sized
    # mesh (need=0 would pass the <= check vacuously)
    assert n_data >= 1 and need <= len(devices), \
        f"need {n_data}x{n_spatial}x{n_model} devices, have {len(devices)}"
    arr = np.asarray(devices[:need]).reshape(n_data, n_spatial, n_model)
    return Mesh(arr, ("data", "spatial", "model"))


def _tp_spec(x, n_model: int) -> P:
    """Shape-rule PartitionSpec for tensor parallelism: conv kernels
    (kh,kw,ci,co) shard co over 'model'; per-channel vectors shard when
    divisible (the 27-channel expand segments replicate); everything
    else (Adam count scalars, ...) replicates.  The same rule maps both
    the param tree and the optax state (whose moment leaves mirror the
    params), so one tree_map shards the whole train state."""
    if x.ndim == 4 and x.shape[-1] % n_model == 0:
        return P(None, None, None, "model")
    if x.ndim == 1 and x.shape[0] % n_model == 0 and x.shape[0] >= n_model:
        return P("model")
    return P()


def shard_train_state(mesh: Mesh, params, opt_state):
    """device_put (params, opt_state) with conv channels sharded over the
    mesh's 'model' axis (see _tp_spec).  The jitted train step then
    inherits these shardings from its committed inputs and XLA inserts
    the activation all-gathers / gradient reduce-scatters."""
    n_model = mesh.shape.get("model", 1)
    put = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jax.device_put(x, NamedSharding(mesh, _tp_spec(x, n_model))),
        t)
    return put(params), put(opt_state)


def make_sharded_apply(mesh: Mesh, factor: int = 3, compute_dtype=None):
    """Jitted (params, batch) -> SR batch with batch sharded over 'data'
    and H over 'spatial'; params replicated.  XLA partitions the convs
    spatially and inserts halo exchanges over ICI automatically."""
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data", "spatial", None, None))

    def apply(params, x):
        return sr_apply(params, x, factor, compute_dtype=compute_dtype)

    return jax.jit(apply, in_shardings=(repl, batch_sh),
                   out_shardings=batch_sh)


def shard_batch(mesh: Mesh, batch: np.ndarray) -> jax.Array:
    """Host batch -> device array laid out over the (data, spatial) mesh."""
    return jax.device_put(batch, NamedSharding(mesh, P("data", "spatial", None, None)))


def tiled_sr_sharded(params, image: np.ndarray, mesh: Mesh, factor: int = 3,
                     *, tile: int = 242, chunk: Optional[int] = None,
                     compute_dtype=None, out16=None) -> np.ndarray:
    """Overlap-tile inference with the tile batch sharded over the mesh's
    'data' axis — SURVEY.md §2.4's "batch-of-tiles data parallelism".

    Each chunk of tiles is device_put with a 'data' sharding; the jitted
    tile kernel then runs embarrassingly parallel across chips (no
    collectives needed on the forward path; results gather to host).
    ``chunk`` is the PER-DEVICE tile count per dispatch (the HBM
    cliff the ladder guards is per chip); default: the measured ladder
    for the packed fast tier, the conservative default otherwise.

    Since round 4 there is ONE sharded tile driver: this delegates to
    ``tiling.tiled_sr_batch(mesh=...)`` (which folder/watch serving
    also rides) with a single-image batch — same gather, per-device
    ladder, kernels, dispatch pipeline and scatter, so outputs remain
    byte-identical to the single-device path (pinned in
    tests/test_parallel.py and tests/test_multichip.py).
    """
    from rusty_sr_tpu.parallel.tiling import tiled_sr_batch
    return tiled_sr_batch(params, [np.asarray(image)], factor, tile=tile,
                          chunk=chunk, compute_dtype=compute_dtype,
                          out16=out16, mesh=mesh)[0]

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
    """
    from rusty_sr_tpu.parallel.tiling import (HALO, _DEFAULT_CHUNK,
                                              _gather_u8, _scatter_u8,
                                              _pick_chunk, _tile_kernel,
                                              _tile_kernel_packed,
                                              packed_trunk_params,
                                              trunk_params)
    from rusty_sr_tpu.utils import native

    if out16 is None:   # match the single-chip fast-tier default
        out16 = compute_dtype is not None
    params = trunk_params(params)
    n_data = mesh.shape["data"]
    u8_io = np.asarray(image).dtype == np.uint8
    img = np.asarray(image) if u8_io else np.asarray(image, dtype=np.float32)
    hgt, wid, _ = img.shape
    h = HALO
    ny = max(1, -(-hgt // tile))
    nx = max(1, -(-wid // tile))
    side = tile + 2 * h
    n_tiles = ny * nx
    use_packed = (compute_dtype is not None and u8_io and side % 2 == 0)
    if u8_io:
        # packed kernel derives zero-pad tiles on device (edge*mask,
        # bit-identical — probe55): skip their gather and upload.
        zt, et, mt = _gather_u8(img, tile, h, ny, nx,
                                need_zero=not use_packed)
    else:
        zt, et, mt = native.gather_tiles(img, tile, h, ny, nx)
    # per-device chunk (single-chip ladder for the packed tier),
    # replicated over the data axis
    if chunk is None:
        chunk = _pick_chunk(max(1, -(-n_tiles // n_data)), tile) \
            if use_packed else _DEFAULT_CHUNK
    chunk = n_data * chunk
    sh = NamedSharding(mesh, P("data", None, None, None))
    repl = NamedSharding(mesh, P())
    if use_packed:
        pp = jax.device_put(packed_trunk_params(params, compute_dtype,
                                                 factor), repl)
    params = jax.device_put(params, repl)

    out_dtype = np.uint8 if u8_io else np.float32
    out = np.zeros((hgt * factor, wid * factor, 3), out_dtype)
    tf = tile * factor
    # Dispatch every chunk before the first fetch (same pipeline as
    # tiled_sr/tiled_sr_batch): a synchronous per-chunk np.asarray would
    # serialise device compute against the D2H round trips.
    from collections import deque
    from rusty_sr_tpu.parallel.tiling import _MAX_INFLIGHT
    pending: deque = deque()

    def drain_one():
        start, cnt, res = pending.popleft()
        if u8_io:
            _scatter_u8(np.asarray(res[:cnt]), start, nx, tf, out)
        else:
            native.scatter_tiles(np.asarray(res[:cnt]), start, nx, out)

    for start in range(0, n_tiles, chunk):
        stop = min(start + chunk, n_tiles)
        cnt = stop - start
        zb = None if zt is None else zt[start:stop]
        eb, mb = et[start:stop], mt[start:stop]
        if cnt < chunk:
            fill = chunk - cnt
            if zb is not None:
                zb = np.concatenate(
                    [zb, np.zeros((fill, side, side, 3), et.dtype)])
            eb = np.concatenate([eb, np.zeros((fill, side, side, 3), et.dtype)])
            mb = np.concatenate([mb, np.zeros((fill, side, side, 1), mt.dtype)])
        if use_packed:
            res = _tile_kernel_packed(
                pp, None, jax.device_put(eb, sh),
                jax.device_put(mb, sh), factor, tile, compute_dtype)
        else:
            res = _tile_kernel(params, jax.device_put(zb, sh),
                               jax.device_put(eb, sh),
                               jax.device_put(mb, sh),
                               factor, tile, compute_dtype, u8_io, out16)
        if hasattr(res, "copy_to_host_async"):
            res.copy_to_host_async()
        pending.append((start, cnt, res))
        if len(pending) >= _MAX_INFLIGHT:
            drain_one()  # bound in-flight chunk memory (per-chip HBM)
    while pending:
        drain_one()
    return out

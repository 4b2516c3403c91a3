"""Extended multi-chip coverage: odd device counts, mesh shapes, dryrun
robustness (the driver calls dryrun_multichip with arbitrary N)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo")

from rusty_sr_tpu import params as P
from rusty_sr_tpu.parallel.mesh import make_mesh, make_sharded_apply, shard_batch
from rusty_sr_tpu.models.sr_net import sr_apply

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def tree():
    return jax.tree.map(jnp.asarray, P.init_params(0, 3))


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_various_device_counts(n):
    import __graft_entry__
    __graft_entry__.dryrun_multichip(n)


def test_dryrun_odd_device_count():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(3)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_mesh_shapes_inference(tree, shape):
    nd, ns = shape
    mesh = make_mesh(n_data=nd, n_spatial=ns)
    fn = make_sharded_apply(mesh, 3)
    x = RNG.random((nd, 8 * ns, 16, 3), dtype=np.float32)
    got = np.asarray(fn(tree, shard_batch(mesh, x)))
    want = np.asarray(jax.jit(lambda p, b: sr_apply(p, b, 3))(
        tree, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_apply_bf16(tree):
    """Fast mode composes with the mesh sharding."""
    mesh = make_mesh(n_data=8, n_spatial=1)
    fn = make_sharded_apply(mesh, 3, compute_dtype=jnp.bfloat16)
    x = RNG.random((8, 12, 12, 3), dtype=np.float32)
    got = np.asarray(fn(tree, shard_batch(mesh, x)))
    want = np.asarray(jax.jit(
        lambda p, b: sr_apply(p, b, 3, compute_dtype=jnp.bfloat16))(
        tree, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-2)

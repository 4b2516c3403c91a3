"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import params as P
from rusty_sr_tpu.models.sr_net import sr_apply
from rusty_sr_tpu.parallel.mesh import make_mesh, make_sharded_apply, shard_batch
from rusty_sr_tpu.train.loop import TrainConfig, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def tree():
    return jax.tree.map(jnp.asarray, P.init_params(0, 3))


def test_dp_inference_matches_single_device(tree):
    mesh = make_mesh(n_data=8, n_spatial=1)
    fn = make_sharded_apply(mesh, 3)
    x = RNG.random((8, 24, 24, 3), dtype=np.float32)
    got = np.asarray(fn(tree, shard_batch(mesh, x)))
    want = np.asarray(jax.jit(lambda p, b: sr_apply(p, b, 3))(tree, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_spatial_sharding_matches_single_device(tree):
    """H-dimension sharding: GSPMD must insert halo exchanges that keep
    the convs exact across shard boundaries."""
    mesh = make_mesh(n_data=2, n_spatial=4)
    fn = make_sharded_apply(mesh, 3)
    x = RNG.random((2, 32, 16, 3), dtype=np.float32)
    got = np.asarray(fn(tree, shard_batch(mesh, x)))
    want = np.asarray(jax.jit(lambda p, b: sr_apply(p, b, 3))(tree, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dp_train_step_matches_single_device(tree):
    cfg = TrainConfig(crop=24, batch_size=8)
    hr = RNG.random((8, 24, 24, 3), dtype=np.float32)

    mesh = make_mesh(n_data=8, n_spatial=1)
    step_m, opt_m = make_train_step(cfg, mesh)
    # the step donates its params/opt_state; give each run its own copy
    tree_m = jax.tree.map(jnp.copy, tree)
    pm, _, loss_m, _ = step_m(tree_m, opt_m.init(tree_m),
                              shard_batch(mesh, hr))

    step_s, opt_s = make_train_step(cfg)
    tree_s = jax.tree.map(jnp.copy, tree)
    ps, _, loss_s, _ = step_s(tree_s, opt_s.init(tree_s), jnp.asarray(hr))

    assert float(loss_m) == pytest.approx(float(loss_s), rel=1e-5)
    for k in ps:
        np.testing.assert_allclose(np.asarray(pm[k]), np.asarray(ps[k]),
                                   atol=1e-6)


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 192, 192, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_tiled_u8_matches_single_device(tree):
    """tiled_sr_sharded on the u8 fast path must byte-match single-device
    tiled_sr (same kernel, tiles merely sharded over 'data')."""
    from rusty_sr_tpu.parallel.mesh import tiled_sr_sharded
    from rusty_sr_tpu.parallel.tiling import tiled_sr
    mesh = make_mesh(n_data=4, n_spatial=1)
    img = RNG.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    want = tiled_sr(tree, img, 3, tile=16, chunk=4)
    got = tiled_sr_sharded(tree, img, mesh, 3, tile=16)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)
    # bf16 fast tier (out16 defaults on) through the sharded path too
    want_f = tiled_sr(tree, img, 3, tile=16, chunk=4,
                      compute_dtype=jnp.bfloat16)
    got_f = tiled_sr_sharded(tree, img, mesh, 3, tile=16,
                             compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(got_f, want_f)


def test_make_mesh_rejects_oversubscription():
    """Inferred n_data flooring to 0 must trip the device-count
    assertion, not silently build a zero-sized mesh."""
    import pytest
    with pytest.raises(AssertionError, match="devices"):
        make_mesh(n_spatial=4, n_model=4)   # 16 > the 8 virtual devices

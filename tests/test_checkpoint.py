"""Orbax native checkpoints + sharded tiled inference + profiling utils."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import params as P
from rusty_sr_tpu.train import checkpoint as ck
from rusty_sr_tpu.train.loop import TrainConfig, make_train_step

RNG = np.random.default_rng(9)


def test_native_checkpoint_roundtrip(tmp_path):
    params = jax.tree.map(jnp.asarray, P.init_params(0, 3))
    cfg = TrainConfig(crop=24)
    _, opt = make_train_step(cfg)
    opt_state = opt.init(params)
    ck.save_native(str(tmp_path), 42, params, opt_state)
    path = ck.latest_native(str(tmp_path))
    assert path and path.endswith("step_00000042")
    got, got_opt, step = ck.restore_native(path)
    assert step == 42
    for k, v in params.items():
        np.testing.assert_array_equal(got[k], np.asarray(v))
    assert got_opt is not None


def test_rsr_and_native_agree(tmp_path):
    params = P.init_params(1, 3)
    ck.save_rsr(str(tmp_path / "p.rsr"), params, 3)
    tree = P.load_rsr_file(str(tmp_path / "p.rsr"), 3)
    for k, v in params.items():
        np.testing.assert_array_equal(tree[k], v)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_tiled_inference_matches():
    from rusty_sr_tpu.parallel.mesh import make_mesh, tiled_sr_sharded
    from rusty_sr_tpu.parallel.tiling import tiled_sr
    params = jax.tree.map(jnp.asarray, P.load_builtin("anime"))
    img = RNG.random((40, 56, 3), dtype=np.float32)
    mesh = make_mesh(n_data=8, n_spatial=1)
    got = tiled_sr_sharded(params, img, mesh, 3, tile=16)
    want = tiled_sr(params, img, 3, tile=16, chunk=8)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_train_loop_writes_native_checkpoints(tmp_path):
    from rusty_sr_tpu.train.loop import train_loop
    cfg = TrainConfig(crop=24, checkpoint_every=2)

    def batches(n):
        for _ in range(n):
            yield RNG.random((cfg.batch_size, cfg.crop, cfg.crop, 3)
                             ).astype(np.float32)

    train_loop(cfg, batches(2), native_ckpt_dir=str(tmp_path / "ck"),
               max_steps=2, log=lambda s: None)
    path = ck.latest_native(str(tmp_path / "ck"))
    assert path is not None
    params, opt_state, step = ck.restore_native(path)
    assert step == 2 and opt_state is not None


def test_device_timer_runs():
    from rusty_sr_tpu.utils.profiling import device_timer
    x = jnp.ones((128, 128), jnp.float32)
    dt = device_timer(lambda c: c * 1.0001, x, iters=4, rounds=1)
    assert dt > 0

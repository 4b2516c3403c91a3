"""Training subsystem tests: loss semantics, step, checkpointing, resume."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rusty_sr_tpu import params as P
from rusty_sr_tpu.models.sr_net import make_lr_from_hr, downsample_apply
from rusty_sr_tpu.train.loop import (
    TrainConfig, loss_fn, make_train_step, train_loop, validation_psnr,
)

RNG = np.random.default_rng(0)


def _hr_batch(n=2, crop=24):
    return RNG.random((n, crop, crop, 3), dtype=np.float32)


@pytest.fixture(scope="module")
def small_params():
    return jax.tree.map(jnp.asarray, P.init_params(0, 3))


class TestLoss:
    def test_pair_synthesis_matches_downsample_net(self):
        """Training derives LR in-graph exactly like the --downsample path
        (reference src/network.rs:87-92 vs :125-138)."""
        hr = jnp.asarray(_hr_batch())
        np.testing.assert_allclose(make_lr_from_hr(hr, 3),
                                   downsample_apply(hr, 3), atol=1e-6)

    def test_l2_reg_term(self, small_params):
        cfg0 = TrainConfig(l2_reg=0.0, crop=24)
        cfg1 = TrainConfig(l2_reg=1e-6, crop=24)
        hr = jnp.asarray(_hr_batch())
        l0, _ = loss_fn(small_params, hr, cfg0)
        l1, _ = loss_fn(small_params, hr, cfg1)
        w2 = sum(float(jnp.sum(w * w)) for w in jax.tree.leaves(small_params))
        assert float(l1 - l0) == pytest.approx(1e-6 * 0.5 * w2, rel=1e-3)

    def test_linear_loss_differs(self, small_params):
        hr = jnp.asarray(_hr_batch())
        a, _ = loss_fn(small_params, hr, TrainConfig(linear_loss=False))
        b, _ = loss_fn(small_params, hr, TrainConfig(linear_loss=True))
        assert abs(float(a) - float(b)) > 1e-9

    def test_l1_option(self, small_params):
        hr = jnp.asarray(_hr_batch())
        a, _ = loss_fn(small_params, hr, TrainConfig(loss_kind="l1", l2_reg=0.0))
        # L1 of residuals in [0,1] must exceed MSE of the same residuals
        b, _ = loss_fn(small_params, hr, TrainConfig(loss_kind="mse", l2_reg=0.0))
        assert float(a) > float(b)


class TestStep:
    def test_loss_decreases_overfit_single_batch(self, small_params):
        cfg = TrainConfig(crop=24, l2_reg=0.0)
        step_fn, opt = make_train_step(cfg)
        # the step donates params/opt_state buffers; copy so the
        # module-scoped fixture survives this test
        params = jax.tree.map(jnp.copy, small_params)
        opt_state = opt.init(params)
        hr = jnp.asarray(_hr_batch(4, 24))
        first = None
        for i in range(30):
            params, opt_state, loss, mse = step_fn(params, opt_state, hr)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.9

    def test_gradients_cover_all_params(self, small_params):
        cfg = TrainConfig(crop=24, l2_reg=0.0)
        hr = jnp.asarray(_hr_batch())
        grads = jax.grad(lambda p: loss_fn(p, hr, cfg)[0])(small_params)
        for name, g in grads.items():
            assert float(jnp.abs(g).max()) > 0.0, f"zero grad for {name}"


class TestLoopAndCheckpoint:
    def test_checkpoint_rsr_roundtrip_and_resume(self, tmp_path):
        cfg = TrainConfig(crop=24, checkpoint_every=2)
        ckpt = str(tmp_path / "ck.rsr")

        def batches(n):
            for _ in range(n):
                yield _hr_batch(cfg.batch_size, cfg.crop)

        final = train_loop(cfg, batches(3), param_file=ckpt, max_steps=3,
                           log=lambda s: None)
        assert os.path.exists(ckpt)
        tree = P.load_rsr_file(ckpt, 3)
        assert P.pytree_to_flat(tree, 3).size == 130_459
        # resume from checkpoint: must accept the loaded tree
        final2 = train_loop(cfg, batches(1), start_params=tree, max_steps=1,
                            log=lambda s: None)
        assert P.pytree_to_flat(final2, 3).shape == (130_459,)

    def test_validation_psnr_reasonable(self):
        """Pretrained weights must beat 20 dB self-supervised PSNR on a
        natural image; random init must be worse."""
        from rusty_sr_tpu.utils.imageio import load_image
        img = load_image("/root/reference/docs/butterfly_lr.png")
        cfg = TrainConfig()
        good = jax.tree.map(jnp.asarray, P.load_builtin("imagenet"))
        psnr_good = validation_psnr(good, [img], cfg)
        assert psnr_good > 20.0
        rand = jax.tree.map(jnp.asarray, P.init_params(1, 3))
        assert validation_psnr(rand, [img], cfg) < psnr_good


class TestData:
    def test_supplier_and_buffer(self, tmp_path):
        from rusty_sr_tpu.train.data import ImageFolderSupplier, PrefetchBuffer
        from rusty_sr_tpu.utils.imageio import save_image
        for i in range(3):
            save_image(str(tmp_path / f"img{i}.png"),
                       RNG.random((40, 50, 3)).astype(np.float32))
        sup = ImageFolderSupplier(str(tmp_path), crop=(24, 24), shuffle=True)
        assert sup.epoch_size() == 3
        buf = PrefetchBuffer(sup, depth=8, batch_size=2)
        b = buf.next_batch()
        assert b.shape == (2, 24, 24, 3)
        assert b.dtype == np.float32
        buf.close()

    def test_sequential_supplier_terminates(self, tmp_path):
        from rusty_sr_tpu.train.data import ImageFolderSupplier
        from rusty_sr_tpu.utils.imageio import save_image
        save_image(str(tmp_path / "a.png"), RNG.random((8, 8, 3)).astype(np.float32))
        sup = ImageFolderSupplier(str(tmp_path), crop=None, shuffle=False)
        imgs = list(sup)
        assert len(imgs) == 1 and imgs[0].shape == (8, 8, 3)

    def test_small_image_padded_crop(self, tmp_path):
        from rusty_sr_tpu.train.data import ImageFolderSupplier
        from rusty_sr_tpu.utils.imageio import save_image
        save_image(str(tmp_path / "small.png"), RNG.random((10, 10, 3)).astype(np.float32))
        sup = ImageFolderSupplier(str(tmp_path), crop=(24, 24))
        img = next(iter(sup))
        assert img.shape == (24, 24, 3)

    def test_all_unreadable_raises_not_spins(self, tmp_path):
        """A folder of undecodable files must raise (on the consumer side
        for a PrefetchBuffer), not spin forever."""
        import pytest
        from rusty_sr_tpu.train.data import ImageFolderSupplier, PrefetchBuffer
        for i in range(2):
            (tmp_path / f"bad{i}.png").write_bytes(b"not a png at all")
        sup = ImageFolderSupplier(str(tmp_path), crop=(8, 8), shuffle=True)
        with pytest.raises(RuntimeError, match="could be decoded"):
            next(iter(sup))
        sup2 = ImageFolderSupplier(str(tmp_path), crop=(8, 8), shuffle=True)
        buf = PrefetchBuffer(sup2, depth=4, batch_size=1)
        try:
            with pytest.raises(RuntimeError, match="could be decoded"):
                buf.next_batch()
        finally:
            buf.close()

    def test_buffer_propagates_any_worker_crash(self, tmp_path):
        """A worker crash that is NOT a RuntimeError (e.g. np.stack over
        variable shapes with crop=None) must re-raise on the consumer —
        not read as a clean end-of-stream that silently truncates
        training."""
        import pytest
        import numpy as np
        from rusty_sr_tpu.utils.imageio import save_image
        from rusty_sr_tpu.train.data import ImageFolderSupplier, PrefetchBuffer
        rng = np.random.default_rng(0)
        save_image(str(tmp_path / "a.png"),
                   rng.random((8, 8, 3)).astype(np.float32))
        save_image(str(tmp_path / "b.png"),
                   rng.random((12, 12, 3)).astype(np.float32))
        sup = ImageFolderSupplier(str(tmp_path), crop=None, shuffle=False)
        buf = PrefetchBuffer(sup, depth=4, batch_size=2)
        try:
            with pytest.raises(ValueError):
                # np.stack of (8,8,3) and (12,12,3) raises in the worker
                buf.next_batch()
        finally:
            buf.close()

    def test_buffer_rejects_zero_batch(self, tmp_path):
        """batch_size=0 would make the worker accumulate forever while
        the consumer spins — reject it at construction."""
        import pytest
        from rusty_sr_tpu.train.data import ImageFolderSupplier, PrefetchBuffer
        import numpy as np
        from rusty_sr_tpu.utils.imageio import save_image
        save_image(str(tmp_path / "a.png"),
                   np.zeros((8, 8, 3), np.float32))
        sup = ImageFolderSupplier(str(tmp_path), crop=(8, 8))
        with pytest.raises(ValueError, match="batch_size"):
            PrefetchBuffer(sup, batch_size=0)

    def test_multihost_striping(self, tmp_path):
        """Training suppliers stripe files across hosts (SURVEY.md §2.4
        multi-host input sharding); validation suppliers keep every file
        so all hosts agree on the PSNR; a starved stripe (hosts > files)
        falls back to the full set instead of raising."""
        from rusty_sr_tpu.train.data import (ImageFolderSupplier,
                                             shard_files_for_host)
        from rusty_sr_tpu.utils.imageio import save_image
        for i in range(5):
            save_image(str(tmp_path / f"img{i}.png"),
                       RNG.random((8, 8, 3)).astype(np.float32))
        s0 = ImageFolderSupplier(str(tmp_path), shuffle=True, crop=(4, 4),
                                 process_index=0, process_count=2)
        s1 = ImageFolderSupplier(str(tmp_path), shuffle=True, crop=(4, 4),
                                 process_index=1, process_count=2)
        assert len(s0.files) == 3 and len(s1.files) == 2
        assert not set(s0.files) & set(s1.files)
        assert sorted(s0.files + s1.files) == \
            sorted(shard_files_for_host(s0.files + s1.files, 0, 1))
        val = ImageFolderSupplier(str(tmp_path), shuffle=False,
                                  process_index=1, process_count=2)
        assert len(val.files) == 5  # sequential: full set on every host
        starved = ImageFolderSupplier(str(tmp_path), shuffle=True,
                                      crop=(4, 4),
                                      process_index=7, process_count=8)
        assert len(starved.files) == 5  # fallback, not an empty epoch

    def test_buffer_shutdown_never_wedges(self, tmp_path):
        """close() with a full queue and an unread sentinel must let the
        worker exit, and next_batch() after close() must return None."""
        import time
        from rusty_sr_tpu.train.data import ImageFolderSupplier, PrefetchBuffer
        from rusty_sr_tpu.utils.imageio import save_image
        for i in range(6):
            save_image(str(tmp_path / f"img{i}.png"),
                       RNG.random((8, 8, 3)).astype(np.float32))
        # sequential: stream ends while the depth-1 queue is full, so the
        # end-of-stream sentinel put would block forever without the fix
        sup = ImageFolderSupplier(str(tmp_path), crop=None, shuffle=False)
        buf = PrefetchBuffer(sup, depth=1, batch_size=1)
        time.sleep(0.3)  # let the worker fill the queue and hit the sentinel
        buf.close()
        buf._thread.join(timeout=5.0)
        assert not buf._thread.is_alive()
        assert buf.next_batch() is None


def test_mixed_precision_training_converges():
    """cfg.amp (bf16 trunk fwd/bwd, f32 master weights) must train:
    finite f32 grads on every param, and loss within a few percent of the
    f32 step's loss on the same batch."""
    cfg32 = TrainConfig(factor=3, batch_size=2, crop=24)
    cfg16 = TrainConfig(factor=3, batch_size=2, crop=24, amp=True)
    hr = RNG.random((2, 24, 24, 3), dtype=np.float32)
    p0 = jax.tree.map(jnp.asarray, P.init_params(5, 3))

    p1_host = jax.tree.map(np.asarray, p0)  # step donates its inputs
    s32, o32 = make_train_step(cfg32)
    p32, st32, l32, _ = s32(p0, o32.init(p0), jnp.asarray(hr))
    p1 = jax.tree.map(jnp.asarray, P.init_params(5, 3))
    s16, o16 = make_train_step(cfg16)
    p16, st16, l16, _ = s16(p1, o16.init(p1), jnp.asarray(hr))

    assert np.isfinite(float(l16))
    assert abs(float(l16) - float(l32)) < 0.05 * abs(float(l32)) + 1e-4
    for k in p16:
        assert p16[k].dtype == jnp.float32, k          # master weights f32
        assert np.all(np.isfinite(np.asarray(p16[k]))), k
    # the update actually moved the params
    moved = sum(float(np.abs(np.asarray(p16[k]) - p1_host[k]).max())
                for k in p16)
    assert moved > 0.0


def test_merged_train_step_matches_flat():
    """The default TPU-first train step (merged convA/B/C forward) is
    mathematically identical to the literal flat 9-conv reference
    topology: same loss, same gradients -> same params after a step
    (VERDICT r2 #1)."""
    import jax
    import jax.numpy as jnp
    from rusty_sr_tpu import params as P
    from rusty_sr_tpu.train.loop import TrainConfig, make_train_step

    params_host = P.init_params(2, 3)
    hr = jnp.asarray(np.random.default_rng(5).random((2, 24, 24, 3),
                                                     dtype=np.float32))
    outs = {}
    for trunk in ("merged", "flat"):
        # fresh device arrays per run: the step donates its inputs
        params = jax.tree.map(jnp.asarray, params_host)
        cfg = TrainConfig(crop=24, trunk=trunk)
        step_fn, opt = make_train_step(cfg)
        st = opt.init(params)
        p2, st2, loss, mse = step_fn(params, st, hr)
        outs[trunk] = (jax.tree.map(np.asarray, p2), float(loss),
                       float(mse))
    assert abs(outs["merged"][1] - outs["flat"][1]) < 1e-9
    assert abs(outs["merged"][2] - outs["flat"][2]) < 1e-9
    for k in outs["flat"][0]:
        # f32 accumulation-order noise only (measured max 2.1e-7 on the
        # post-Adam params; the Adam update scale is ~2e-3)
        np.testing.assert_allclose(outs["merged"][0][k], outs["flat"][0][k],
                                   atol=1e-6, rtol=1e-5, err_msg=k)


def test_multi_step_dispatch_matches_single(tmp_path):
    """steps_per_dispatch>1 (lax.scan inside one jit) must produce the
    same training trajectory as per-step dispatch — same batches, same
    order, same final params (f32-noise class)."""
    import jax
    import jax.numpy as jnp
    from rusty_sr_tpu.train.loop import TrainConfig, train_loop

    rng = np.random.default_rng(8)
    batches = [rng.random((2, 12, 12, 3)).astype(np.float32)
               for _ in range(16)]
    quiet = lambda s: None  # noqa: E731

    def run(spd):
        cfg = TrainConfig(crop=12, batch_size=2, steps_per_dispatch=spd)
        return train_loop(cfg, iter(batches), max_steps=16, log=quiet,
                          seed=3)
    single = run(1)
    multi = run(5)   # singles 1-5, groups 6-10/11-15, single 16
    for k in single:
        np.testing.assert_allclose(np.asarray(multi[k]),
                                   np.asarray(single[k]),
                                   atol=1e-6, rtol=1e-5, err_msg=k)


def test_precision_high_step_close_to_highest():
    """cfg.precision='high' (3-pass dots) must track the exact step
    closely (f32-mantissa class: the post-step params differ by
    rounding noise, not structure)."""
    import jax
    import jax.numpy as jnp
    from rusty_sr_tpu.train.loop import TrainConfig, make_train_step
    ph = P.init_params(4, 3)
    hr = jnp.asarray(np.random.default_rng(6).random((2, 24, 24, 3),
                                                     dtype=np.float32))
    outs = {}
    for prec in ("highest", "high"):
        params = jax.tree.map(jnp.asarray, ph)
        cfg = TrainConfig(crop=24, precision=prec)
        step_fn, opt = make_train_step(cfg)
        p2, _, loss, _ = step_fn(params, opt.init(params), hr)
        outs[prec] = (jax.tree.map(np.asarray, p2), float(loss))
    assert abs(outs["high"][1] - outs["highest"][1]) \
        < 1e-3 * abs(outs["highest"][1]) + 1e-7
    for k in outs["highest"][0]:
        np.testing.assert_allclose(outs["high"][0][k],
                                   outs["highest"][0][k],
                                   atol=5e-4, rtol=5e-3, err_msg=k)


def test_packed_trunk_training(tmp_path):
    """trunk='packed' (differentiable s2d trunk): gradients reach all 19
    reference tensors, outputs track the amp (bf16 merged) forward in
    the bf16 class, and a few steps reduce the loss."""
    import jax
    import jax.numpy as jnp
    from rusty_sr_tpu.models.sr_net import (merge_params, sr_apply,
                                            sr_apply_packed)
    from rusty_sr_tpu.train.loop import TrainConfig, make_train_step

    ph = P.init_params(7, 3)
    params = jax.tree.map(jnp.asarray, ph)
    x = jnp.asarray(np.random.default_rng(2).random((2, 16, 16, 3),
                                                    dtype=np.float32))
    ref = np.asarray(sr_apply(params, x, 3))
    got = np.asarray(sr_apply_packed(merge_params(params), x, 3))
    assert np.max(np.abs(got - ref)) < 3e-2      # bf16 class
    assert np.mean(np.abs(got - ref)) < 3e-3

    cfg = TrainConfig(crop=24, trunk="packed", l2_reg=0.0)
    from rusty_sr_tpu.train.loop import loss_fn
    hr = jnp.asarray(np.random.default_rng(3).random((2, 24, 24, 3),
                                                     dtype=np.float32))
    grads = jax.grad(lambda p: loss_fn(p, hr, cfg)[0])(params)
    for name, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), name
        assert float(jnp.abs(g).max()) > 0.0, f"zero grad for {name}"

    step_fn, opt = make_train_step(cfg)
    p2 = jax.tree.map(jnp.copy, params)
    st = opt.init(p2)
    first = None
    for _ in range(25):
        p2, st, loss, mse = step_fn(p2, st, hr)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.9


def test_val_every_cadence_independent_of_checkpoints(tmp_path):
    """val_every and checkpoint_every are independent cadences: with
    val_every=2 / checkpoint_every=4 over 4 steps, validation fires at
    steps 1, 2, 4 and checkpoints land at 1 and 4 only — and the
    multi-step dispatch grouping still aligns to BOTH boundaries."""
    from rusty_sr_tpu.train import checkpoint as ck
    cfg = TrainConfig(crop=12, checkpoint_every=4, val_every=2)
    rng = np.random.default_rng(11)
    batches = [rng.random((cfg.batch_size, cfg.crop, cfg.crop, 3)
                          ).astype(np.float32) for _ in range(4)]
    val = [rng.random((12, 12, 3)).astype(np.float32)]
    logs = []
    train_loop(cfg, iter(batches), max_steps=4, val_images=val,
               native_ckpt_dir=str(tmp_path / "ck"), log=logs.append)
    assert sum("Validation PSNR" in s for s in logs) == 3
    last = ck.latest_native(str(tmp_path / "ck"))
    assert last and last.endswith("step_00000004")
    import os
    steps = sorted(d for d in os.listdir(tmp_path / "ck")
                   if d.startswith("step_"))
    assert steps == ["step_00000001", "step_00000004"]


def test_validate_flag_drives_cadence_without_val_images(tmp_path):
    """Multi-host contract: ``validate`` (uniform across processes)
    gates the validation cadence even on a process holding no
    val_images (only the main host loads them).  Every val_every step
    must reach the cadence sink — under multi-host that point contains
    a collective param gather, so a process skipping it (the pre-fix
    `bool(val_images)` gate) deadlocks the fleet and computes a
    DIFFERENT dispatch-group size than process 0."""
    import json
    cfg = TrainConfig(crop=12, checkpoint_every=100, val_every=1)
    rng = np.random.default_rng(8)
    batches = [rng.random((cfg.batch_size, cfg.crop, cfg.crop, 3)
                          ).astype(np.float32) for _ in range(3)]
    mf = tmp_path / "m.jsonl"
    train_loop(cfg, iter(batches), max_steps=3, val_images=None,
               validate=True, metrics_file=str(mf), log=lambda s: None)
    recs = [json.loads(ln) for ln in mf.read_text().splitlines()]
    # val_every=1 fires the cadence at every step even with no local
    # val_images; no PSNR is scored (that is the main host's job)
    assert [r["step"] for r in recs] == [1, 2, 3]
    assert all("val_psnr" not in r for r in recs)


def test_final_params_written_to_rsr_off_cadence(tmp_path):
    """A run whose last step is off the checkpoint cadence must still
    leave the FINAL trained params in the .rsr output — pre-fix,
    `train out.rsr D --max_steps 50` handed the user the step-1 file
    (up to checkpoint_every-1 steps of training silently lost)."""
    cfg = TrainConfig(crop=12, checkpoint_every=100)
    rng = np.random.default_rng(4)
    batches = [rng.random((cfg.batch_size, cfg.crop, cfg.crop, 3)
                          ).astype(np.float32) for _ in range(3)]
    pf = str(tmp_path / "out.rsr")
    final = train_loop(cfg, iter(batches), max_steps=3, param_file=pf,
                       log=lambda s: None)
    got = P.load_rsr_file(pf, cfg.factor)
    for k in final:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(final[k]))


def test_multi_step_dispatch_actually_groups(monkeypatch):
    """Spy on both step factories: with steps_per_dispatch=4 and
    checkpoint_every=4, a 9-step run must execute steps 5-8 as ONE
    multi-dispatch over a (4,B,...) stack and the rest as singles —
    equivalence-with-baseline tests alone cannot catch the feature
    silently regressing to per-step dispatch."""
    from rusty_sr_tpu.train import loop as L
    calls = {"multi": [], "single": 0}
    real_multi = L.make_train_step_multi
    real_single = L.make_train_step

    def spy_multi(cfg, n, mesh=None, **kw):
        fn, opt = real_multi(cfg, n, mesh, **kw)

        def wrapped(p, s, hrs):
            calls["multi"].append(int(hrs.shape[0]))
            return fn(p, s, hrs)
        return wrapped, opt

    def spy_single(cfg, mesh=None, **kw):
        fn, opt = real_single(cfg, mesh, **kw)

        def wrapped(p, s, hr):
            calls["single"] += 1
            return fn(p, s, hr)
        return wrapped, opt

    monkeypatch.setattr(L, "make_train_step_multi", spy_multi)
    monkeypatch.setattr(L, "make_train_step", spy_single)
    cfg = TrainConfig(crop=12, checkpoint_every=4, steps_per_dispatch=4)
    rng = np.random.default_rng(7)
    batches = [rng.random((cfg.batch_size, cfg.crop, cfg.crop, 3)
                          ).astype(np.float32) for _ in range(9)]
    L.train_loop(cfg, iter(batches), max_steps=9, log=lambda s: None)
    # steps 1-4 single (groups start at step%spd==0 past step 1),
    # steps 5-8 one 4-step dispatch, step 9 single (tail < spd)
    assert calls["multi"] == [4]
    assert calls["single"] == 5


def test_l1_loss_closed_form():
    """loss_kind='l1' must be mean|sr(lr(hr)) - hr| (+ the L2 reg term)
    — 'L1 > MSE on sub-1 residuals' alone cannot catch a mis-reduction
    (sum instead of mean, wrong tensor)."""
    import jax
    from rusty_sr_tpu.models.sr_net import make_lr_from_hr
    from rusty_sr_tpu import sr_apply
    tree = jax.tree.map(jnp.asarray, P.init_params(1, 3))
    hr = jnp.asarray(_hr_batch(2, 12))
    cfg = TrainConfig(crop=12, loss_kind="l1")
    loss, (mse,) = loss_fn(tree, hr, cfg)[0], (loss_fn(tree, hr, cfg)[1],)
    sr = sr_apply(tree, make_lr_from_hr(hr, 3), 3)
    want_l1 = float(jnp.mean(jnp.abs(sr - hr)))
    reg = 1e-6 * 0.5 * sum(float(jnp.sum(jnp.square(v)))
                           for v in tree.values())
    np.testing.assert_allclose(float(loss), want_l1 + reg, rtol=1e-5)


def test_supplier_pixels_roundtrip_and_crops_are_windows(tmp_path):
    """Pixel CONTENT gates for the data pipeline: the sequential
    supplier must round-trip the saved pixels, and every random crop
    must be a contiguous sub-window of the source image (shape/dtype
    checks alone pass with channel-swapped, transposed, or zeroed
    crops)."""
    from rusty_sr_tpu.train.data import ImageFolderSupplier
    from rusty_sr_tpu.utils.imageio import save_image
    # a gradient image where every (y, x) has a unique (R, G) signature
    h, w = 40, 56
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = np.arange(h)[:, None] / 255.0
    img[..., 1] = np.arange(w)[None, :] / 255.0
    img[..., 2] = 0.5
    d = tmp_path / "ti"
    d.mkdir()
    save_image(str(d / "g.png"), img)

    seq = ImageFolderSupplier(str(d), shuffle=False, crop=None)
    got = next(iter(seq))
    np.testing.assert_allclose(got, img, atol=1 / 255.0)

    sup = ImageFolderSupplier(str(d), crop=(16, 16), shuffle=True, seed=3)
    it = iter(sup)
    for _ in range(4):
        c = next(it)
        assert c.shape == (16, 16, 3)
        y0 = round(float(c[0, 0, 0]) * 255.0)
        x0 = round(float(c[0, 0, 1]) * 255.0)
        np.testing.assert_allclose(
            c, img[y0:y0 + 16, x0:x0 + 16], atol=1.1 / 255.0)

"""Training: optax Adam, self-supervised pair synthesis, DP over a mesh.

Mirrors the reference's `train` driver (src/main.rs:181-257) TPU-natively:

- The HR crop is the *only* input; the LR input is derived inside the
  jitted step (sRGB→linear → f×f mean-pool → linear→sRGB, reference
  src/network.rs:87-92) so pair synthesis runs fused on device.
- Loss: MSE on sRGB output, or on linearised output with linear_loss
  (src/network.rs:94-100), plus L2 regularisation (coef 1e-6) on every
  parameter (src/main.rs:185, src/network.rs:79-84).
- Adam with the reference hyperparameters: lr 2e-3, β1 0.95, β2 0.995,
  ε 1e-7, batch 4 (src/main.rs:199-205).
- Checkpoint every 100 steps and at step 1 to byte-compatible `.rsr`
  (src/main.rs:210-217); validation PSNR every 100 steps
  (src/main.rs:231-250); `max_evals` sample budget (src/main.rs:253).
- Data parallelism: the step is jitted with the batch sharded over the
  'data' axis of a `jax.sharding.Mesh` and params replicated; XLA inserts
  the gradient all-reduce over ICI.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rusty_sr_tpu import params as params_lib
from rusty_sr_tpu.models.sr_net import sr_apply, make_lr_from_hr
from rusty_sr_tpu.ops.color import srgb_to_linear


@dataclasses.dataclass
class TrainConfig:
    factor: int = 3
    batch_size: int = 4            # src/main.rs:200
    crop: int = 192                # src/main.rs:187
    learning_rate: float = 2e-3    # src/main.rs:204
    beta1: float = 0.95            # src/main.rs:201
    beta2: float = 0.995           # src/main.rs:202
    epsilon: float = 1e-7          # src/main.rs:203
    l2_reg: float = 1e-6           # src/main.rs:185
    linear_loss: bool = False      # --linearLoss
    loss_kind: str = "mse"         # "mse" (reference) or "l1" (BASELINE.json configs)
    max_evals: int = 10_000_000    # sample budget, src/main.rs:253
    checkpoint_every: int = 100    # src/main.rs:211
    val_every: int = 100           # src/main.rs:233
    remat: bool = False            # jax.checkpoint the forward (big crops)
    steps_per_dispatch: int = 10   # device-resident multi-step training:
    #                                upload N batches at once and lax.scan
    #                                N optimizer steps inside ONE jit
    #                                dispatch.  At this model's size a
    #                                single step is ~0.1-0.5 ms of real
    #                                compute, so per-step host dispatch
    #                                dominates (probe47: chained 3.14
    #                                vs host-stepped 4.75 ms/step at the
    #                                reference batch).  Clamped so
    #                                checkpoint/validation cadence
    #                                boundaries stay exact.
    trunk: str = "merged"          # "merged" (default): the train step
    #                                runs the same merged-conv forward the
    #                                inference trunk uses (conv1/2/3 ->
    #                                convA etc., models.sr_net.merge_params
    #                                traced inside the step, so gradients
    #                                flow back through the concat to the
    #                                19 reference tensors and checkpoints
    #                                stay byte-stable).  The flat 9-conv
    #                                form strands 3/4 of the MXU's lanes
    #                                (27-32 wide stages); merging is
    #                                mathematically identical (conv is
    #                                linear in the kernel; same products).
    #                                "flat" keeps the literal reference
    #                                topology (debugging).
    amp: bool = False              # mixed precision: bf16 conv trunk in
    #                                the fwd/bwd pass (single-pass MXU
    #                                dots), f32 master weights/Adam
    #                                state/loss (classic AMP; no
    #                                reference equivalent).  Round-3
    #                                correction: the round-2 "30x slower"
    #                                measurement was host-dispatch
    #                                fiction; under the device-resident
    #                                loop AMP is ~2x FASTER than f32 at
    #                                every batch (probe47/48: b4 1.54 vs
    #                                3.11 ms/step, b32 11.7 vs 24.6).
    precision: str = "highest"     # f32-path conv precision: "highest"
    #                                (6-pass, reference-parity class, the
    #                                default) or "high" (3-pass bf16x3 —
    #                                ~f32-mantissa class, +15% step rate,
    #                                probe48).  Ignored under amp.


def loss_fn(params, hr, cfg: TrainConfig):
    """Scalar loss + aux (mse) for a batch of HR crops (N,H,W,3).

    ``hr`` may arrive as uint8 codes (the CropPipeline's u8 upload path:
    4x less host->device transfer — on the tunneled dev host the f32
    upload dominated the end-to-end step); the conversion to f32/255 is
    the same multiply the host would do, so batches are bit-identical.

    With cfg.remat, the forward is rematerialised in the backward pass
    (jax.checkpoint) — trades FLOPs for HBM when training on large crops.
    """
    if hr.dtype == jnp.uint8:
        hr = hr.astype(jnp.float32) * (1.0 / 255.0)
    lr = make_lr_from_hr(hr, cfg.factor)
    cd = jnp.bfloat16 if cfg.amp else None

    # Under amp no override is needed: sr_apply* casts both operands to
    # bf16 and conv2d_same resolves sub-f32 operands to single-pass
    # DEFAULT-precision MXU dots with f32 accumulation (probe48: 11.7 vs
    # 12.6 ms/step at batch 32 vs forced-HIGHEST emulation).
    conv_fn = None
    if not cfg.amp and cfg.precision == "high":
        # 3-pass bf16x3 dots: ~f32-mantissa class, +15% (probe48).
        from rusty_sr_tpu.ops.conv import _conv_im2col
        from jax import lax as _lax

        def conv_fn(x, w):
            return _conv_im2col(x, w, jnp.float32, _lax.Precision.HIGH)

    if cfg.trunk == "packed":
        # bf16 space-to-depth trunk (the inference fast-tier packing,
        # differentiable form) — an AMP-class tier: quarter resolution,
        # 4x channels, single-pass MXU dots.  See models.sr_apply_packed.
        from rusty_sr_tpu.models.sr_net import merge_params, sr_apply_packed

        def fwd(p, x, f):
            return sr_apply_packed(merge_params(p), x, f,
                                   compute_dtype=jnp.bfloat16)
    elif cfg.trunk == "merged":
        # TPU-first forward: merge the 27-32-wide same-source convs into
        # the wide convA/B/C stages the inference trunk runs (3.4x there).
        # merge_params is traced inside the step: the concat's gradient
        # is a slice, so grads cover all 19 reference tensors and the
        # master params / Adam state / checkpoints keep the reference
        # layout.
        from rusty_sr_tpu.models.sr_net import merge_params, sr_apply_fused

        def fwd(p, x, f):
            return sr_apply_fused(merge_params(p), x, f, compute_dtype=cd,
                                  conv_fn=conv_fn,
                                  round_output=False, conv0_split=False)
    else:
        def fwd(p, x, f):
            return sr_apply(p, x, f, compute_dtype=cd, conv_fn=conv_fn)

    if cfg.remat:
        fwd = jax.checkpoint(fwd, static_argnums=(2,))
    out = fwd(params, lr, cfg.factor)
    if cfg.linear_loss:
        a, b = srgb_to_linear(out), srgb_to_linear(hr)
    else:
        a, b = out, hr
    mse = jnp.mean((a - b) ** 2)
    if cfg.loss_kind == "l1":
        data_loss = jnp.mean(jnp.abs(a - b))
    else:
        data_loss = mse
    reg = 0.0
    if cfg.l2_reg:
        # Convention assumption: alumina's L2Regularisation source is not
        # available, so whether its gradient is coef*w (the ½coef·w² form
        # used here) or 2·coef·w cannot be verified from the call-sites
        # (src/network.rs:79-84).  At coef 1e-6 the two differ far below
        # the data-loss gradient scale; tune cfg.l2_reg if exact training
        # parity against a reference run ever matters.
        reg = cfg.l2_reg * 0.5 * sum(jnp.sum(w * w)
                                     for w in jax.tree.leaves(params))
    return data_loss + reg, mse


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2,
                      eps=cfg.epsilon)


def make_train_step(cfg: TrainConfig, mesh: Optional[Mesh] = None,
                    *, spatial: bool = False) -> Callable:
    """Jitted (params, opt_state, hr_batch) -> (params, opt_state, loss, mse).

    With a mesh, the batch is sharded over the 'data' axis (and the image H
    dimension over 'spatial' when requested — GSPMD partitions the convs
    with halo exchange over ICI) while params/opt state are replicated;
    the gradient all-reduce is inserted by XLA.
    """
    opt = make_optimizer(cfg)

    def step(params, opt_state, hr):
        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, hr, cfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mse

    # params/opt_state are consumed and re-emitted every step: donating
    # them lets XLA update in place instead of copying ~1 MB of state per
    # step (free HBM + step time at larger widths/crops).
    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1)), opt

    batch_sh = NamedSharding(
        mesh, P("data", "spatial" if spatial else None, None, None))
    if mesh.shape.get("model", 1) > 1:
        # Tensor parallelism: params/opt state arrive channel-sharded via
        # parallel.mesh.shard_train_state (committed inputs), the step
        # inherits those shardings (in_shardings=None), and donation keeps
        # the state in place across steps.
        return jax.jit(step, in_shardings=(None, None, batch_sh),
                       donate_argnums=(0, 1)), opt

    repl = NamedSharding(mesh, P())
    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, batch_sh),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )
    return jitted, opt


def make_train_step_multi(cfg: TrainConfig, n_steps: int,
                          mesh: Optional[Mesh] = None,
                          *, spatial: bool = False) -> Callable:
    """Jitted (params, opt_state, hrs) -> (params, opt_state, loss, mse)
    running ``n_steps`` optimizer steps over hrs (n_steps, N, H, W, 3)
    in ONE dispatch (lax.scan over the single-step body) — the
    TPU-resident training pattern: per-step host dispatch costs ~30% of
    the step at the reference batch size (probe47).  Returns the LAST
    step's loss/mse, matching what the single-step path would log at a
    cadence boundary."""
    opt = make_optimizer(cfg)

    def one(params, opt_state, hr):
        (loss, mse), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, hr, cfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mse

    def multi(params, opt_state, hrs):
        def body(carry, hr):
            p, s = carry
            p, s, loss, mse = one(p, s, hr)
            return (p, s), (loss, mse)
        (params, opt_state), (losses, mses) = lax.scan(
            body, (params, opt_state), hrs)
        return params, opt_state, losses[-1], mses[-1]

    if mesh is None:
        return jax.jit(multi, donate_argnums=(0, 1)), opt

    batch_sh = NamedSharding(
        mesh, P(None, "data", "spatial" if spatial else None, None, None))
    if mesh.shape.get("model", 1) > 1:
        return jax.jit(multi, in_shardings=(None, None, batch_sh),
                       donate_argnums=(0, 1)), opt
    repl = NamedSharding(mesh, P())
    return jax.jit(multi, in_shardings=(repl, repl, batch_sh),
                   out_shardings=(repl, repl, repl, repl),
                   donate_argnums=(0, 1)), opt


def _np_srgb_to_linear(x: np.ndarray) -> np.ndarray:
    return np.where(x <= 0.04045, x / 12.92,
                    ((x + 0.055) / 1.055) ** 2.4).astype(np.float32)


def _np_linear_to_srgb(x: np.ndarray) -> np.ndarray:
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.maximum(x, 0.0) ** (1 / 2.4) - 0.055
                    ).astype(np.float32)


def _np_make_lr(hr: np.ndarray, f: int) -> np.ndarray:
    """Host-side self-supervised pair synthesis (srgb->linear -> f x f
    mean-pool -> linear->srgb, reference src/network.rs:87-92).

    Validation images have arbitrary shapes; doing this in numpy keeps
    validation at ZERO device compiles (the device pipeline is only for
    the fixed-shape training step)."""
    lin = _np_srgb_to_linear(np.asarray(hr, np.float32))
    h, w, c = lin.shape
    lin = lin.reshape(h // f, f, w // f, f, c).mean(axis=(1, 3))
    return _np_linear_to_srgb(lin)


class RssBudgetExceeded(RuntimeError):
    """Raised by train_loop AFTER saving final checkpoints when the
    host-RSS budget (``max_rss_gb``) is crossed — the run is cleanly
    resumable with ``--resume``.  Exists because this environment's
    tunneled TPU backend leaks host memory 1:1 with every H2D/D2H
    transfer (PERF.md round 5: ~3.5 MB/step at the production recipe —
    the 100k-step protocol run OOM'd at ~36k steps without a budget),
    so long runs restart themselves instead of meeting the OOM killer:

        until rusty-sr train out.rsr DATA --ckpt_dir ck --resume ck \\
              --max_rss_gb 80 ...; do :; done

    (budget exit = rc 75 / this exception; completion = rc 0).
    """

    def __init__(self, step: int, rss_gb: float):
        super().__init__(
            f"host RSS {rss_gb:.1f} GB crossed the budget at step {step}; "
            "checkpoints saved — restart with --resume to continue")
        self.step = step


def _host_rss_gb() -> float:
    """CURRENT host RSS in GB (VmRSS), not the lifetime peak.

    ru_maxrss is the process-lifetime high-water: a one-off spike above
    the budget (a large validation decode, say) would permanently trip
    the --max_rss_gb gate for the rest of the leg, degenerating the run
    into restart churn.  /proc is Linux-only; the ru_maxrss fallback
    (peak, KB on Linux / bytes on macOS) keeps the gate conservative
    elsewhere."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / (1 << 20)  # kB -> GB
    except (OSError, ValueError, IndexError):
        pass
    import resource
    import sys
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    return peak / ((1 << 30) if sys.platform == "darwin" else (1 << 20))


def _host_tree(tree):
    """Host-local numpy copy of a (possibly multi-host global) tree.

    Fully-replicated global arrays are read from the local replica;
    sharded ones are allgathered.  The gather is a COLLECTIVE: under
    multi-host, every process must call this at the same program point
    (the checkpoint cadence does) or the runtime deadlocks.
    """
    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                return np.asarray(x)
            from jax.experimental import multihost_utils
            # tiled=True: x is one global array whose shards live across
            # processes (TP-sharded params) — gather THE array, don't
            # stack per-process copies (tiled=False also plain rejects
            # non-fully-addressable inputs).
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(one, tree)


def validation_psnr(params, val_images, cfg: TrainConfig,
                    apply_fn: Optional[Callable] = None,
                    tile: int = 242) -> float:
    """Pixel-weighted validation PSNR over whole images
    (reference src/main.rs:231-250): -10*log10(sum(err*px)/sum(px)).

    SR runs through the fixed-shape overlap-tile path (bit-identical to
    the whole-image forward, tests/test_tiling.py) so validating on
    arbitrary image sizes triggers no recompiles — on a real TPU with
    minutes-per-compile, shape-polymorphic validation every 100 steps
    would dominate the run."""
    from rusty_sr_tpu.parallel.tiling import tiled_sr

    err_sum, pix_sum = 0.0, 0.0
    for hr in val_images:
        hr = np.asarray(hr, np.float32)
        f = cfg.factor
        # Crop HR so it pools evenly, as the in-graph pipeline requires.
        h, w, _ = hr.shape
        hr = hr[: h - h % f, : w - w % f]
        lr = _np_make_lr(hr, f)
        if apply_fn is not None:
            out = np.asarray(apply_fn(params, jnp.asarray(lr)[None])[0])
        else:
            out = tiled_sr(params, lr, f, tile=tile, chunk=4)
        if cfg.linear_loss:
            a, b = _np_srgb_to_linear(out), _np_srgb_to_linear(hr)
        else:
            a, b = out, hr
        mse = float(np.mean((a - b) ** 2))
        px = hr.shape[0] * hr.shape[1]
        err_sum += mse * px
        pix_sum += px
    return -10.0 * math.log10(max(err_sum / pix_sum, 1e-300))


def train_loop(cfg: TrainConfig, train_batches, *, start_params=None,
               param_file: Optional[str] = None,
               val_images: Optional[list] = None,
               log: Callable[[str], None] = print,
               mesh: Optional[Mesh] = None,
               max_steps: Optional[int] = None,
               metrics_file: Optional[str] = None,
               native_ckpt_dir: Optional[str] = None,
               resume_from: Optional[str] = None,
               validate: Optional[bool] = None,
               max_rss_gb: Optional[float] = None,
               seed: int = 0):
    """Run the reference's training protocol; returns final params.

    ``train_batches`` yields (N,crop,crop,3) f32 HR batches (host numpy).
    ``metrics_file``: optional JSONL observability stream (step, loss, mse,
    validation PSNR, wall time) — the reference only has stdout
    (SURVEY.md §5 metrics row).
    ``resume_from``: a native (orbax) checkpoint — either a `step_*` path
    or a directory of them (the latest is taken) — restores params,
    optimizer state AND the step counter, so a crashed run continues with
    its Adam moments and the 10 M-sample budget / checkpoint cadence
    intact.  The reference can only restart from bare params
    (`--start`, src/main.rs:190-195); this is the §5 restartability row.
    ``validate``: whether the validation cadence is ACTIVE — must be the
    same on every process of a multi-host run, because it shapes the
    dispatch-group size and gates a collective param gather, while
    ``val_images`` (the data) lives on the main host only.  Defaults to
    ``bool(val_images)``, which is only correct single-host.
    ``max_rss_gb``: leak-tolerant long runs — when host RSS crosses the
    budget, save final checkpoints and raise :class:`RssBudgetExceeded`
    (see its docstring: this environment's tunneled backend leaks host
    memory per transfer; a supervisor loop restarts with ``--resume``).
    """
    import json
    import time as _time

    if validate is None:
        validate = bool(val_images)
    params = start_params if start_params is not None else \
        params_lib.init_params(seed, cfg.factor)
    params = jax.tree.map(jnp.asarray, params)
    # A mesh with a spatial axis means the user ASKED for H-dimension
    # partitioning (cli --mesh data=N,spatial=M) — honour it; leaving
    # spatial=False would replicate the batch over that axis and the
    # spatial devices would do fully redundant work.
    use_spatial = mesh is not None and mesh.shape.get("spatial", 1) > 1
    step_fn, opt = make_train_step(cfg, mesh, spatial=use_spatial)
    opt_state = opt.init(params)

    start_step = 0
    if resume_from is not None:
        import os
        from rusty_sr_tpu.train import checkpoint as _ck
        path = _ck.latest_native(resume_from)
        if path is None and os.path.isdir(resume_from) and \
                os.path.basename(os.path.normpath(resume_from)) \
                .startswith("step_"):
            path = resume_from  # an explicit step_* checkpoint path
        is_own_ckpt_dir = native_ckpt_dir is not None and \
            os.path.realpath(resume_from) == os.path.realpath(native_ckpt_dir)
        if path is None and (os.path.isdir(resume_from) or is_own_ckpt_dir):
            # Idempotent-restart contract: `--resume` pointing at this
            # run's own checkpoint dir (or any dir that simply has no
            # checkpoints YET — the first launch of a wrapper that
            # always passes --resume) starts fresh rather than crashing.
            log(f"No checkpoint under {resume_from!r} yet — "
                "starting fresh")
        elif path is None:
            raise RuntimeError(f"no native checkpoint found at "
                               f"{resume_from!r}")
        if path is not None:
            like = {"params": jax.tree.map(np.asarray, params),
                    "opt_state": jax.tree.map(np.asarray, opt_state),
                    "step": 0}
            # Decide params-only from the checkpoint's METADATA, not by
            # retrying on restore errors: a tree mismatch (wrong factor,
            # different optimizer) must surface as a clean error below,
            # never silently resume with fresh Adam moments.
            try:
                has_opt = "opt_state" in _ck.checkpoint_keys(path)
            except Exception as e:
                raise RuntimeError(
                    f"unreadable checkpoint at {path!r}: {e}") from e
            if not has_opt:
                like.pop("opt_state")
                log(f"Checkpoint {path} has no optimizer state — "
                    "resuming with fresh Adam moments")
            try:
                r_params, r_opt, start_step = \
                    _ck.restore_native(path, like)
            except (FileNotFoundError, ValueError, KeyError) as e:
                # surface as the CLI's clean error contract, not an
                # orbax traceback (e.g. factor-2 weights into a factor-3
                # run, or a different optimizer's state tree)
                raise RuntimeError(
                    f"incompatible or unreadable checkpoint at "
                    f"{path!r}: {e}") from e
            params = jax.tree.map(jnp.asarray, r_params)
            if r_opt is not None:
                opt_state = jax.tree.map(jnp.asarray, r_opt)
            log(f"Resumed from {path} at step {start_step}")

    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from rusty_sr_tpu.parallel.mesh import shard_train_state
        params, opt_state = shard_train_state(mesh, params, opt_state)

    # Multi-host (jax.distributed): each host's data pipeline yields its
    # LOCAL slice of the global batch (cfg.batch_size / process_count
    # crops); the global sharded array is assembled per step below, so
    # the jitted step sees one (batch_size, ...) array over the whole
    # mesh and XLA's gradient all-reduce spans hosts via the mesh axes.
    nproc = jax.process_count()
    multihost = mesh is not None and nproc > 1
    if multihost:
        sp = "spatial" if use_spatial else None
        batch_sh = NamedSharding(mesh, P("data", sp, None, None))
        if mesh.shape.get("model", 1) == 1:  # TP already put its shardings
            repl = NamedSharding(mesh, P())
            params = jax.device_put(params, repl)
            opt_state = jax.device_put(opt_state, repl)

        batch5_sh = NamedSharding(mesh, P(None, "data", sp, None, None))

        def to_device(hr):
            # dtype-preserving: u8 batches upload as u8 (loss_fn converts
            # on device), f32 batches as f32
            return jax.make_array_from_process_local_data(
                batch_sh, np.asarray(hr))

        def to_device_multi(hrs):
            return jax.make_array_from_process_local_data(batch5_sh, hrs)
    else:
        def to_device(hr):
            return jnp.asarray(hr)

        def to_device_multi(hrs):
            return jnp.asarray(hrs)

    budget_steps = cfg.max_evals // cfg.batch_size
    if max_steps is not None:
        budget_steps = min(budget_steps, max_steps)

    mf = open(metrics_file, "a") if metrics_file else None
    t_start = _time.time()
    step = start_step
    last_native_ckpt = start_step
    last_rsr_ckpt = start_step

    def cadence(step, loss, mse):
        nonlocal last_native_ckpt, last_rsr_ckpt
        # Checkpointing and validation run on independent cadences
        # (both default 100 = the reference's single cadence,
        # src/main.rs:211,233); step 1 fires both, as the reference does.
        do_ckpt = step % cfg.checkpoint_every == 0 or step == 1
        # ``validate`` (not val_images) gates the cadence: it is uniform
        # across processes, so under multi-host every process reaches the
        # collective gather below at the same step even though only the
        # main host holds val_images and scores PSNR.
        do_val = validate and (step % cfg.val_every == 0 or step == 1)
        if not (do_ckpt or do_val):
            return
        # Multi-host: params/opt state live on the GLOBAL mesh and are
        # not fully addressable from one process.  Materialise host-local
        # numpy copies here, on EVERY process (the gather is a collective
        # when TP-sharded), so the per-process sinks below — .rsr write,
        # orbax save, validation — only ever touch local data.
        if multihost:
            host_params = _host_tree(params)
            host_opt = _host_tree(opt_state) if do_ckpt else None
        else:
            host_params, host_opt = params, opt_state
        if do_ckpt and param_file is not None:
            host = jax.tree.map(np.asarray, host_params)
            params_lib.save_rsr_file(param_file, host, cfg.factor)
            last_rsr_ckpt = step
        if do_ckpt and native_ckpt_dir is not None:
            from rusty_sr_tpu.train import checkpoint as _ck
            _ck.save_native(native_ckpt_dir, step, host_params, host_opt)
            last_native_ckpt = step
        psnr = None
        if do_val and val_images:
            psnr = validation_psnr(host_params, val_images, cfg)
            log(f"Validation PSNR:\t{psnr}")
        elif do_ckpt:
            log(f"step {step}\tloss {float(loss):.6g}\t"
                f"mse {float(mse):.6g}")
        if mf is not None:
            rec = {"step": step, "loss": float(loss),
                   "mse": float(mse), "wall_s": _time.time() - t_start}
            if psnr is not None:
                rec["val_psnr"] = psnr
            mf.write(json.dumps(rec) + "\n")
            mf.flush()

    # Device-resident multi-step groups: per-step host dispatch costs
    # ~30% of a step at this model's size (probe47).  Groups start at
    # step % spd == 0 and spd divides every cadence (checkpoint AND
    # validation), so each boundary (step 1, multiples of either) still
    # lands exactly at the end of a dispatch.
    cad = cfg.checkpoint_every
    if validate:   # uniform across processes (val_images is main-host-only)
        cad = math.gcd(cad, cfg.val_every)
    spd = max(1, min(cfg.steps_per_dispatch, cad))
    while cad % spd:
        spd -= 1
    multi_fn = None
    rss_stop = None
    it = iter(train_batches)
    try:
        while step < budget_steps:
            # step > start_step: each leg makes at least one step of
            # progress even if it starts over budget, so a supervisor
            # `until ...; do :; done` loop always terminates.
            if max_rss_gb is not None and step > start_step:
                rss = _host_rss_gb()
                if multihost:
                    # UNIFORM decision: one process breaking while the
                    # others dispatch the next sharded step leaves the
                    # mesh deadlocked on mismatched collectives (the
                    # round-3 `validate`-gate lesson) — gate on the
                    # fleet-max RSS so all legs stop together.
                    from jax.experimental import multihost_utils
                    rss = float(np.max(multihost_utils.process_allgather(
                        np.asarray(rss, np.float32))))
                if rss > max_rss_gb:
                    rss_stop = rss
                    log(f"host RSS {rss_stop:.1f} GB > budget "
                        f"{max_rss_gb} GB at step {step} — checkpointing "
                        "and stopping (resume with --resume)")
                    break
            group = spd if (spd > 1 and step >= 1 and step % spd == 0
                            and budget_steps - step >= spd) else 1
            batches = []
            for _ in range(group):
                hr = next(it, None)
                if hr is None:
                    break
                batches.append(hr)
            if len(batches) == spd and group == spd and spd > 1:
                if multi_fn is None:
                    multi_fn, _ = make_train_step_multi(
                        cfg, spd, mesh, spatial=use_spatial)
                hrs = np.stack([np.asarray(h) for h in batches])
                params, opt_state, loss, mse = multi_fn(
                    params, opt_state, to_device_multi(hrs))
                step += spd
                cadence(step, loss, mse)
            else:
                for hr in batches:
                    step += 1
                    params, opt_state, loss, mse = step_fn(
                        params, opt_state, to_device(hr))
                    cadence(step, loss, mse)
            if not batches or len(batches) < group:
                break   # input stream exhausted
    finally:
        if mf is not None:
            mf.close()
    # Multihost/TP: params live on the global mesh and are not fully
    # addressable from one process — np.asarray on them raises.  Gather
    # host-local copies (a collective, so run it on every process) before
    # the final checkpoint and return, exactly like cadence() does.
    host_params = _host_tree(params) if multihost else params
    if param_file is not None and step > last_rsr_ckpt:
        # FINAL params to the .rsr output: a run whose last step is off
        # the 100-step cadence must not hand the user a file that is up
        # to checkpoint_every-1 steps stale (the whole point of
        # `train OUT.rsr` is that OUT.rsr holds the trained weights).
        params_lib.save_rsr_file(
            param_file, jax.tree.map(np.asarray, host_params), cfg.factor)
    if native_ckpt_dir is not None and step > last_native_ckpt:
        # Final-state checkpoint: a finished (or step-capped) run can be
        # resumed/extended from exactly where it stopped, not from the
        # last 100-step boundary.
        from rusty_sr_tpu.train import checkpoint as _ck
        host_opt = _host_tree(opt_state) if multihost else opt_state
        _ck.save_native(native_ckpt_dir, step, host_params, host_opt)
    if rss_stop is not None:
        raise RssBudgetExceeded(step, rss_stop)
    return jax.tree.map(np.asarray, host_params)

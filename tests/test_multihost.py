"""Multi-host training path (SURVEY.md §2.4 DCN row; VERDICT r2 #4).

Spawns a REAL second process: both run the CLI `train` subcommand with
`--coordinator/--num_processes/--process_id`, which initialises
jax.distributed, stripes the training folder per host
(train.data.shard_files_for_host) and assembles the global batch across
processes — localhost CPU, one virtual device per process.
"""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cli_train(tmp_path):
    from rusty_sr_tpu.utils.imageio import save_image
    rng = np.random.default_rng(0)
    ti = tmp_path / "ti"
    ti.mkdir()
    for i in range(4):
        save_image(str(ti / f"t{i}.png"),
                   rng.random((200, 200, 3)).astype(np.float32))
    out = tmp_path / "out.rsr"
    port = _free_port()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")

    def cmd(pid: int):
        # --ckpt_dir and --val_folder exercise the multi-host cadence:
        # orbax saves are collective (all processes), validation runs on
        # host-local param copies on the main process only.
        return [sys.executable, "-m", "rusty_sr_tpu.cli", "train",
                str(out), str(ti), "--platform", "cpu",
                "--max_steps", "2", "--batch", "4",
                "--ckpt_dir", str(tmp_path / "ck"),
                "-v", str(ti), "-m", "1",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(pid)]

    p1 = subprocess.Popen(cmd(1), env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    try:
        p0 = subprocess.run(cmd(0), env=env, capture_output=True,
                            text=True, timeout=900)
        out1, _ = p1.communicate(timeout=900)
    finally:
        if p1.poll() is None:
            p1.kill()
    assert p0.returncode == 0, f"proc0:\n{p0.stdout}\n{p0.stderr}"
    assert p1.returncode == 0, f"proc1:\n{out1}"
    # 4 files striped over 2 hosts -> 2 per host
    assert "process 0/2, 2 training files" in p0.stdout
    assert "process 1/2, 2 training files" in out1
    # only the main host runs the reference stdout protocol + checkpoints
    assert "Beginning Training" in p0.stdout and "Done" in p0.stdout
    assert "Beginning Training" not in out1
    assert out.stat().st_size == 1_043_676  # step-1 .rsr checkpoint
    # validation ran on the main host at the step-1 cadence
    assert "Validation PSNR:" in p0.stdout
    assert "Validation PSNR:" not in out1
    # the collective orbax save produced a restorable checkpoint
    from rusty_sr_tpu.train import checkpoint as ck
    path = ck.latest_native(str(tmp_path / "ck"))
    assert path is not None
    _, opt_state, step = ck.restore_native(path)
    assert step >= 1 and opt_state is not None


def test_partial_distributed_flags_error(capsys):
    from rusty_sr_tpu import cli
    rc = cli.main(["train", "o.rsr", "ti", "--coordinator", "x:1"])
    assert rc == 2
    assert "needs all of" in capsys.readouterr().err


def test_two_process_tp_validation_only_step(tmp_path):
    """Regression: a validation-only cadence step (val_every=1,
    checkpoint_every=100) under a multi-host MODEL-parallel mesh.  The
    param gather at that step is a collective (TP-sharded params are not
    fully addressable), and the dispatch-group size derives from the
    cadence gcd — pre-fix, both were gated on val_images (main host
    only), so process 1 picked spd=10 vs process 0's spd=1 and never
    entered the gather: mismatched SPMD programs + distributed deadlock.
    Two virtual devices per process -> a 4-device data=2,model=2 mesh."""
    from rusty_sr_tpu.utils.imageio import save_image
    rng = np.random.default_rng(1)
    ti = tmp_path / "ti"
    ti.mkdir()
    for i in range(4):
        save_image(str(ti / f"t{i}.png"),
                   rng.random((200, 200, 3)).astype(np.float32))
    out = tmp_path / "out.rsr"
    port = _free_port()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")

    def cmd(pid: int):
        return [sys.executable, "-m", "rusty_sr_tpu.cli", "train",
                str(out), str(ti), "--platform", "cpu",
                "--max_steps", "3", "--batch", "4",
                "--mesh", "data=2,model=2",
                "-v", str(ti), "-m", "1", "--val_every", "1",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(pid)]

    p1 = subprocess.Popen(cmd(1), env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    try:
        p0 = subprocess.run(cmd(0), env=env, capture_output=True,
                            text=True, timeout=900)
        out1, _ = p1.communicate(timeout=900)
    finally:
        if p1.poll() is None:
            p1.kill()
    assert p0.returncode == 0, f"proc0:\n{p0.stdout}\n{p0.stderr}"
    assert p1.returncode == 0, f"proc1:\n{out1}"
    # validation fired at EVERY step on the main host only
    assert p0.stdout.count("Validation PSNR:") == 3
    assert "Validation PSNR:" not in out1
    assert "Done" in p0.stdout


def test_two_process_multistep_dispatch(tmp_path):
    """Device-resident multi-step groups under multi-host: with no
    validation and checkpoint_every=2, the cadence gcd is 2, so
    steps_per_dispatch clamps to 2 and steps 3-4 run as ONE dispatch of
    make_train_step_multi over the global (2, B, ...) batch array
    (to_device_multi / batch5_sh).  No existing test drove that
    assembly across processes."""
    from rusty_sr_tpu.utils.imageio import save_image
    rng = np.random.default_rng(2)
    ti = tmp_path / "ti"
    ti.mkdir()
    for i in range(4):
        save_image(str(ti / f"t{i}.png"),
                   rng.random((200, 200, 3)).astype(np.float32))
    out = tmp_path / "out.rsr"
    port = _free_port()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")

    def cmd(pid: int):
        return [sys.executable, "-m", "rusty_sr_tpu.cli", "train",
                str(out), str(ti), "--platform", "cpu",
                "--max_steps", "4", "--batch", "4",
                "--ckpt_every", "2",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(pid)]

    p1 = subprocess.Popen(cmd(1), env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    try:
        p0 = subprocess.run(cmd(0), env=env, capture_output=True,
                            text=True, timeout=900)
        out1, _ = p1.communicate(timeout=900)
    finally:
        if p1.poll() is None:
            p1.kill()
    assert p0.returncode == 0, f"proc0:\n{p0.stdout}\n{p0.stderr}"
    assert p1.returncode == 0, f"proc1:\n{out1}"
    # checkpoint log lines must appear at steps 1, 2 and 4 EXACTLY
    # (step 4 ends a 2-step dispatch group; step 3 has no cadence) —
    # 'Done' + file size alone cannot catch --ckpt_every being ignored
    # or the grouped dispatch skipping a cadence boundary
    for s in (1, 2, 4):
        assert f"step {s}\tloss" in p0.stdout, p0.stdout
    assert "step 3\tloss" not in p0.stdout
    assert "Done" in p0.stdout
    assert out.stat().st_size == 1_043_676

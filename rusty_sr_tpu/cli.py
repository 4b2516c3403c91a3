"""Command-line interface — full flag parity with the reference CLI.

Reference surface (src/main.rs:33-127): positional INPUT_FILE OUTPUT_FILE,
`-p/--parameters {imagenet,imagenetlinear,anime,bilinear}`, `-c/--custom
FILE`, `-d/--downsample`, plus a `train` subcommand with PARAMETER_FILE,
TRAINING_FOLDER, `-l/--linearLoss`, `-r/--recurse`, `-s/--start FILE`,
`-v/--val_folder DIR`, `-m/--val_max N`.  We additionally expose
`-f/--factor` (the reference's TODO at src/main.rs:30,161) and perf knobs.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# Persistent XLA compilation cache: on a real TPU a fresh executable takes
# minutes to compile; without a disk cache EVERY process pays it again.
# Respect an existing setting; JAX ignores the dir if it can't create it.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rusty_sr_tpu",
                 "jax_cache"))


def build_parser() -> argparse.ArgumentParser:
    """Upscale-mode parser (the default command)."""
    p = argparse.ArgumentParser(
        prog="rusty_sr_tpu",
        description="A convolutional neural network trained to upscale images "
                    "(TPU-native). Run the `train` subcommand to learn new weights.",
    )
    p.add_argument("--version", action="version", version="rusty_sr_tpu v0.1.0")
    p.add_argument("INPUT_FILE",
                   help="input image to upscale, or a folder of images "
                        "(tiles are then batched across images)")
    p.add_argument("OUTPUT_FILE",
                   help="output file to write/overwrite (.png recommended); "
                        "a folder when INPUT_FILE is a folder")
    p.add_argument("-p", "--parameters",
                   choices=["imagenet", "imagenetlinear", "anime", "bilinear"],
                   help="which built-in parameters to use with the neural net")
    p.add_argument("-c", "--custom", metavar="PARAMETER_FILE",
                   help="custom parameter file (.rsr) to use with the neural net")
    p.add_argument("-d", "--downsample", action="store_true",
                   help="perform downscaling rather than upscaling")
    p.add_argument("-f", "--factor", type=int, default=3,
                   help="upscale factor (reference hardcodes 3; custom weights must match)")
    p.add_argument("--tile", type=int, default=242,
                   help="LR tile size for overlap-tile inference")
    p.add_argument("--chunk", type=int, default=None,
                   help="tiles per device dispatch (default: picked per "
                        "image from the measured throughput ladder)")
    p.add_argument("--fast", action="store_true",
                   help="bf16 packed trunk — ~7.7x the exact default "
                        "(1356 vs ~175 MPix/s on v5e) within the 0.05 dB "
                        "ground-truth quality budget; ~1 u8 code max "
                        "deviation vs exact (PERF.md)")
    p.add_argument("--engine", choices=["xla", "fused"], default="xla",
                   help="device engine. 'xla' is the product path; "
                        "'fused' is the EXPERIMENTAL Pallas trunk kernel "
                        "— correct but ~8x slower than the default "
                        "(168 vs 1356 MPix/s on v5e, PERF.md), kept as "
                        "the kernel-work vehicle. (The int8 trunk was "
                        "retired: +4.5%% for ~8 dB, PERF.md probe59; "
                        "it remains a models.quant API experiment.)")
    p.add_argument("--mesh", metavar="SPEC", default=None,
                   help="shard the tile batch over a device mesh: "
                        "'data=N' or just 'N' (batch-of-tiles data "
                        "parallelism; no collectives on the forward path)")
    p.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                   help="force a JAX platform (default: environment's)")
    p.add_argument("--trace", metavar="DIR", default=None,
                   help="capture an XLA profiler trace of the run to DIR "
                        "(view in TensorBoard/Perfetto)")
    return p


def _parse_mesh(spec_str: str):
    """'data=N[,spatial=M][,model=K]' or 'N' -> jax.sharding.Mesh
    (raises ValueError)."""
    from rusty_sr_tpu.parallel.mesh import make_mesh
    spec = dict(kv.split("=") for kv in spec_str.split(",")) \
        if "=" in spec_str else {"data": spec_str}
    if "data" not in spec:
        raise ValueError("mesh spec needs a 'data' axis")
    n_data = int(spec.pop("data"))
    n_spatial = int(spec.pop("spatial", 1))
    n_model = int(spec.pop("model", 1))
    if spec:
        raise ValueError(f"unknown mesh axes {sorted(spec)}")
    return make_mesh(n_data=n_data, n_spatial=n_spatial, n_model=n_model)


def build_train_parser() -> argparse.ArgumentParser:
    t = argparse.ArgumentParser(
        prog="rusty_sr_tpu train",
        description="Train a new set of neural parameters on your own dataset")
    t.add_argument("PARAMETER_FILE", help="learned parameters are (over)written to this .rsr file")
    t.add_argument("TRAINING_FOLDER", help="images from this folder are used for training")
    t.add_argument("-l", "--linearLoss", action="store_true", dest="linear_loss",
                   help="apply MSE loss to linearised RGB output rather than sRGB values")
    t.add_argument("-r", "--recurse", action="store_true",
                   help="recurse into subfolders looking for files")
    t.add_argument("-s", "--start", metavar="FILE",
                   help="start training from parameters in this .rsr file")
    t.add_argument("-v", "--val_folder", metavar="DIR",
                   help="images from this folder are used to evaluate training progress")
    t.add_argument("-m", "--val_max", type=int, metavar="N",
                   help="upper limit on number of images per validation pass")
    t.add_argument("-f", "--factor", type=int, default=3)
    t.add_argument("--loss", choices=["mse", "l1"], default="mse",
                   help="data loss (reference uses MSE; L1 is the BASELINE.json extra)")
    t.add_argument("--max_steps", type=int, default=None,
                   help="optional hard step cap (for smoke runs)")
    t.add_argument("--metrics", metavar="FILE", default=None,
                   help="append JSONL training metrics to FILE")
    t.add_argument("--ckpt_dir", metavar="DIR", default=None,
                   help="also write orbax native checkpoints (params + "
                        "optimizer state, resumable) to DIR")
    t.add_argument("--resume", metavar="DIR", nargs="?", const="",
                   default=None,
                   help="resume from the latest native checkpoint in DIR "
                        "(default: --ckpt_dir), restoring params, "
                        "optimizer state and the step counter — unlike "
                        "-s/--start, which loads bare params only")
    t.add_argument("--mesh", metavar="SPEC", default=None,
                   help="parallel training over a device mesh: "
                        "'data=N[,spatial=M][,model=K]' or just 'N' "
                        "(batch shards over 'data', image height over "
                        "'spatial', conv channels + optimizer state over "
                        "'model'; XLA inserts the collectives)")
    t.add_argument("--amp", action="store_true",
                   help="mixed-precision training: bf16 conv trunk in the "
                        "forward/backward pass, f32 master weights and "
                        "optimizer state — ~2x faster than f32 at every "
                        "batch size on v5e (PERF.md probe47/48)")
    t.add_argument("--trunk", choices=["merged", "flat", "packed"],
                   default="merged",
                   help="train-step forward form: 'merged' (wide convA/"
                        "B/C, the TPU-first default), 'flat' (literal "
                        "reference topology), 'packed' (bf16 space-to-"
                        "depth trunk — the inference fast-tier packing; "
                        "AMP-class quality, ~1.9x over --amp at batch "
                        ">= 32 and ~even at batch 4 — PERF.md probe50)")
    t.add_argument("--precision", choices=["highest", "high"],
                   default="highest",
                   help="f32 conv precision: 'highest' (6-pass, "
                        "reference-parity class) or 'high' (3-pass, "
                        "~f32-mantissa class, +15%% step rate); ignored "
                        "with --amp")
    t.add_argument("--crop", type=int, default=None, metavar="N",
                   help="HR training crop side (reference hardcodes 192, "
                        "src/main.rs:187 — generalised like the factor "
                        "flag). Must be divisible by the factor, and give "
                        "an even LR crop for --trunk packed. Larger crops "
                        "raise MXU utilisation per step at more HBM "
                        "(PERF.md crop-shape curve; pair with --remat)")
    t.add_argument("--remat", action="store_true",
                   help="rematerialise the forward in the backward pass "
                        "(jax.checkpoint): trades ~1/3 more FLOPs for "
                        "activation HBM — for large --crop/--batch")
    t.add_argument("--batch", type=int, default=None,
                   help="batch size (reference default 4); must divide "
                        "evenly over the mesh 'data' axis")
    t.add_argument("--ckpt_every", type=int, default=None, metavar="N",
                   help="checkpoint cadence in steps (default 100, the "
                        "reference's; step 1 always checkpoints)")
    t.add_argument("--val_every", type=int, default=None, metavar="N",
                   help="validation cadence in steps (default 100, the "
                        "reference's single combined cadence; independent "
                        "of --ckpt_every)")
    t.add_argument("--steps_per_dispatch", type=int, default=None,
                   metavar="N",
                   help="device-resident multi-step training: scan N "
                        "optimizer steps inside one dispatch (default 10; "
                        "clamped to divide the ckpt/val cadences; 1 "
                        "disables — per-step host dispatch costs ~30%% of "
                        "a step at the reference batch, PERF.md probe47)")
    t.add_argument("--max_rss_gb", type=float, default=None, metavar="G",
                   help="leak-tolerant long runs: when host RSS crosses G "
                        "GB, checkpoint and exit rc 75 (resume with "
                        "--resume; supervise with `until rusty-sr train "
                        "... --ckpt_dir ck --resume ck --max_rss_gb G; do "
                        ":; done`). Exists because this environment's "
                        "tunneled TPU backend leaks host memory per "
                        "transfer (PERF.md round 5)")
    t.add_argument("--data_workers", type=int, default=None, metavar="N",
                   help="host decode/crop worker threads feeding the "
                        "device (default: CPU count, capped at 16); the "
                        "batch stream is bit-identical for any N")
    t.add_argument("--coordinator", metavar="HOST:PORT", default=None,
                   help="multi-host training: coordinator address for "
                        "jax.distributed (run the same command on every "
                        "host with its own --process_id); each host "
                        "feeds a disjoint stripe of TRAINING_FOLDER over "
                        "DCN while gradients sync over ICI")
    t.add_argument("--num_processes", type=int, default=None,
                   help="multi-host training: total number of processes")
    t.add_argument("--process_id", type=int, default=None,
                   help="multi-host training: this process's id (0-based; "
                        "process 0 hosts the coordinator and writes "
                        "checkpoints/validation output)")
    t.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                   help="force a JAX platform (default: environment's)")
    t.add_argument("--trace", metavar="DIR", default=None,
                   help="capture an XLA profiler trace of the run to DIR "
                        "(view in TensorBoard/Perfetto)")
    return t


def _fast_tier_tip(args) -> None:
    """One stderr line steering exact-tier users to the tier that beats
    the north star (round-3 review: a user who doesn't know --fast
    exists gets the 7.7x-slower parity default with no signpost)."""
    if not getattr(args, "fast", False) \
            and getattr(args, "engine", "xla") == "xla":
        print("tip: running the exact-parity tier (~175 MPix/s on v5e); "
              "--fast is ~7.7x faster within the documented 0.05 dB "
              "quality budget (PERF.md)", file=sys.stderr)


def run_upscale(args) -> int:
    import jax.numpy as jnp
    from rusty_sr_tpu import params as params_lib
    from rusty_sr_tpu.parallel.tiling import tiled_sr
    from rusty_sr_tpu.utils.imageio import (
        DECODE_ERRORS, save_image, load_image_u8, save_image_u8)

    if args.custom and args.parameters:
        print("error: --custom conflicts with --parameters", file=sys.stderr)
        return 2
    if args.downsample and (args.custom or args.parameters):
        print("error: --downsample conflicts with --parameters/--custom",
              file=sys.stderr)
        return 2

    import os
    if os.path.isdir(args.INPUT_FILE):
        return _run_upscale_folder(args)

    try:
        # Decode once as u8 (the device paths take u8 directly; the f32
        # view is derived only where a path needs it).
        img_u8 = load_image_u8(args.INPUT_FILE)
    except DECODE_ERRORS as e:
        print(f"Error opening input image file: {e}", file=sys.stderr)
        return 1
    compute_dtype = jnp.bfloat16 if args.fast else None

    if args.downsample or args.parameters == "bilinear":
        # Non-neural paths ride the fixed-shape tile kernel too: a
        # whole-image jit would compile per image size (minutes each on
        # a real TPU).
        from rusty_sr_tpu.parallel.tiling import tiled_simple
        if args.downsample:
            print("Downsampling using average pooling of linear RGB "
                  "values...", end="", flush=True)
            f = args.factor
            h, w, _ = img_u8.shape
            out = tiled_simple(img_u8[: h - h % f, : w - w % f], f,
                               mode="downsample")
        else:
            print("Upscaling using bilinear interpolation...", end="",
                  flush=True)
            out = tiled_simple(img_u8, args.factor, mode="bilinear")
        print(" Writing file...", end="", flush=True)
        try:
            save_image_u8(args.OUTPUT_FILE, out)
        except OSError as e:
            print(f"\nCould not write output file: {e}", file=sys.stderr)
            return 1
        print(" Done")
        return 0
    else:
        _fast_tier_tip(args)
        if args.custom:
            print("Upscaling using custom neural net parameters...", end="", flush=True)
            src = args.custom
            loader = lambda: params_lib.load_rsr_file(args.custom, args.factor)  # noqa: E731
        else:
            name = args.parameters or "imagenet"
            label = {"imagenet": "imagenet", "imagenetlinear": "linear loss imagenet",
                     "anime": "anime"}[name]
            print(f"Upscaling using {label} neural net parameters...", end="", flush=True)
            src = f"builtin '{name}'"
            loader = lambda: params_lib.load_builtin(name, args.factor)  # noqa: E731
        try:
            tree = loader()
        except OSError as e:
            # reference: expect("Error opening parameter file"), src/main.rs:134
            print(f"\nError opening parameter file: {e}", file=sys.stderr)
            return 1
        except ValueError as e:
            # reference: assert at src/main.rs:162 — also hit for builtin
            # weights with a non-default -f (the builtins are factor-3).
            print(f"\nerror: {e} ({src}). Parameters selected do not have the "
                  "size required by the neural net. Ensure that the same factor "
                  "is used for upscaling and training.", file=sys.stderr)
            return 1
        tree = {k: jnp.asarray(v) for k, v in tree.items()}
        if getattr(args, "mesh", None) and args.engine == "xla":
            from rusty_sr_tpu.parallel.mesh import tiled_sr_sharded
            try:
                mesh = _parse_mesh(args.mesh)
            except (ValueError, AssertionError) as e:
                print(f"\nerror: bad --mesh {args.mesh!r}: {e}",
                      file=sys.stderr)
                return 2
            out = tiled_sr_sharded(tree, img_u8, mesh, args.factor,
                                   tile=args.tile, chunk=args.chunk,
                                   compute_dtype=compute_dtype)
            print(" Writing file...", end="", flush=True)
            try:
                save_image_u8(args.OUTPUT_FILE, out)
            except OSError as e:
                print(f"\nError creating output image file: {e}",
                      file=sys.stderr)
                return 1
            print(" Done")
            return 0
        elif getattr(args, "mesh", None):
            print(f"\nerror: --mesh supports the 'xla' engine only "
                  f"(got {args.engine!r})", file=sys.stderr)
            return 2
        if args.engine == "xla":
            # u8 tiles end-to-end: 4x less host<->device transfer
            out = tiled_sr(tree, img_u8, args.factor, tile=args.tile,
                           chunk=args.chunk, compute_dtype=compute_dtype)
            print(" Writing file...", end="", flush=True)
            try:
                save_image_u8(args.OUTPUT_FILE, out)
            except OSError as e:
                # reference: expect("Could not write output file"), :175
                print(f"\nCould not write output file: {e}", file=sys.stderr)
                return 1
            print(" Done")
            return 0
        img = img_u8.astype(np.float32) / 255.0
        out = tiled_sr(tree, img, args.factor, tile=args.tile, chunk=args.chunk,
                       compute_dtype=compute_dtype, engine=args.engine)

    print(" Writing file...", end="", flush=True)
    try:
        save_image(args.OUTPUT_FILE, out)
    except OSError as e:
        # reference: expect("Could not write output file"), src/main.rs:175
        print(f"\nCould not write output file: {e}", file=sys.stderr)
        return 1
    print(" Done")
    return 0


class _StableNamer:
    """Output name per source path, stable for the namer's lifetime.

    Batch-local de-dup (`_output_names`) is not enough for the resident
    watcher: 'a.png' and 'a.jpg' can arrive in DIFFERENT poll batches
    and would silently overwrite each other's 'a.png' output.  The first
    source to claim a stem keeps it; later colliding sources keep their
    full original name ('a.jpg.png')."""

    def __init__(self):
        self._owner: dict = {}   # output name -> source path

    def __call__(self, f: str) -> str:
        stem = os.path.splitext(os.path.basename(f))[0] + ".png"
        if self._owner.setdefault(stem, f) == f:
            return stem
        # The fallback must be claim-checked too: with sources 'a.png',
        # 'a.jpg.png' and 'a.jpg' in play, the last one's fallback
        # 'a.jpg.png' is already owned — keep suffixing until free.
        cand = os.path.basename(f) + ".png"
        k = 1
        while self._owner.setdefault(cand, f) != f:
            k += 1
            cand = f"{os.path.basename(f)}.{k}.png"
        return cand


def _output_names(paths) -> list:
    """Output file names (stem.png) for a batch of input paths — the
    same first-claim-wins collision policy as the resident watcher
    (one _StableNamer implementation, two entry points): 'a.png' and
    'a.jpg' would otherwise both map to 'a.png' and silently overwrite
    each other."""
    namer = _StableNamer()
    return [namer(f) for f in paths]


class _AsyncWriter:
    """Write-behind PNG encoder pool for folder/watch serving.

    PNG encode bounds end-to-end folder serving, not device compute
    (native codec ~13-19 MPix/s/core, PIL fallback ~2.6, chip ~1356).
    Saves run on worker threads (both encoders release the GIL) while
    the device computes later chunks; a bounded pending window
    back-pressures the producer (the tile drain loop) so finished-but-
    unwritten outputs can't pile up on host.  ``finish()`` joins and
    returns the write failures instead of raising mid-batch."""

    def __init__(self, workers: Optional[int] = None):
        import concurrent.futures
        import threading
        if workers is None:
            workers = max(1, min(8, (os.cpu_count() or 2)))
        self._sem = threading.Semaphore(2 * workers + 2)
        self._ex = concurrent.futures.ThreadPoolExecutor(workers)
        self._futs: list = []   # (path, future)

    def submit(self, path: str, img) -> None:
        from rusty_sr_tpu.utils.imageio import save_image_u8
        self._sem.acquire()   # blocks the drain loop when saturated

        def job():
            try:
                # png_threads=1: this pool already parallelises across
                # images; intra-image deflate threads would oversubscribe.
                save_image_u8(path, img, png_threads=1)
            finally:
                self._sem.release()

        self._futs.append((path, self._ex.submit(job)))

    def finish(self) -> list:
        """Join all writes; [(path, exception), ...] for the failures."""
        fails = []
        for path, fut in self._futs:
            try:
                fut.result()
            except OSError as e:
                fails.append((path, e))
        self._futs = []
        self._ex.shutdown(wait=True)
        return fails


# Host-memory budget per device group in folder mode: decoded LR input
# bytes per tiled_sr_batch call.  HR outputs are factor^2 larger but are
# written behind and released per image (release_outputs), so the LR
# budget is what bounds resident memory; one group is decoded ahead
# while the previous computes.  128 MB ~= 170 512x512 images per group —
# large enough that per-group chunk padding stays negligible.
_GROUP_LR_BYTES = 128 << 20


def _decoded_groups(files, budget_bytes: int = None, on_error=None):
    """Yield [(orig_index, u8_image), ...] groups, decoding on a small
    thread pool ONE GROUP AHEAD of the consumer (queue depth 1): group
    k+1 decodes while the device computes group k.  Unreadable files
    are reported and skipped — ``on_error(index, exc)`` overrides the
    default stderr report (the watcher's retry bookkeeping; called on
    the producer thread).  ``budget_bytes`` reads _GROUP_LR_BYTES at
    CALL time (a def-time default would pin the module value and make
    test monkeypatching a silent no-op)."""
    import concurrent.futures
    import queue as _q
    import threading
    from rusty_sr_tpu.utils.imageio import DECODE_ERRORS, load_image_u8

    if budget_bytes is None:
        budget_bytes = _GROUP_LR_BYTES
    out_q: "_q.Queue" = _q.Queue(maxsize=1)
    workers = max(1, min(8, (os.cpu_count() or 2)))
    # Consumer-abandonment latch: if the generator is closed mid-stream
    # (GeneratorExit — e.g. tiled_sr_batch raised mid-group in a resident
    # embedder), the producer must not block forever on the depth-1 queue
    # holding ~a group of decoded images alive.  All producer puts go
    # through _put, which polls this event.
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                out_q.put(item, timeout=0.2)
                return True
            except _q.Full:
                continue
        return False

    def _decode(item):
        i, f = item
        try:
            return i, load_image_u8(f)
        except DECODE_ERRORS as e:
            return i, e

    def _producer():
        from collections import deque
        group, used = [], 0
        try:
            with concurrent.futures.ThreadPoolExecutor(workers) as ex:
                # Bounded-window submission (Executor.map would submit
                # EVERY file at once — unbounded decoded-image memory on
                # a big folder); combined with the depth-1 group queue,
                # decode-ahead tops out at ~2 groups + 2 pool widths.
                futs: deque = deque()
                it = iter(enumerate(files))

                def refill():
                    while len(futs) < 2 * workers and not stop.is_set():
                        try:
                            futs.append(ex.submit(_decode, next(it)))
                        except StopIteration:
                            return

                refill()
                while futs and not stop.is_set():
                    i, img = futs.popleft().result()
                    refill()
                    if isinstance(img, Exception):
                        if on_error is not None:
                            on_error(i, img)
                        else:
                            print(f"skipping {files[i]}: {img}",
                                  file=sys.stderr)
                        continue
                    group.append((i, img))
                    used += img.nbytes
                    if used >= budget_bytes:
                        if not _put(group):
                            return
                        group, used = [], 0
            if group:
                if not _put(group):
                    return
            _put(None)
        except BaseException as e:  # propagate to the consumer
            _put(e)

    threading.Thread(target=_producer, daemon=True).start()
    try:
        while True:
            item = out_q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # GeneratorExit / consumer error: release the producer thread
        # (and its held group) instead of leaking both.
        stop.set()


def _run_upscale_folder(args) -> int:
    """Folder mode: upscale every image in INPUT_FILE into OUTPUT_FILE/,
    batching tiles across images to amortise per-dispatch fixed costs.

    The neural path is a three-stage host/device pipeline: a decode pool
    stages bounded groups of images one group ahead, the tile driver
    keeps up to 8 chunks in flight on device, and finished images are
    PNG-encoded on a write-behind pool the moment their last tile drains
    (encode — 13-19 MPix/s/core native, 2.6 PIL fallback — is the
    end-to-end limiter; serialising it after compute would idle the
    chip behind the host)."""
    import os
    import jax.numpy as jnp
    from rusty_sr_tpu import params as params_lib
    from rusty_sr_tpu.parallel.tiling import tiled_sr_batch
    from rusty_sr_tpu.train.data import list_images
    from rusty_sr_tpu.utils.imageio import (
        DECODE_ERRORS, load_image_u8, save_image_u8)

    files = list_images(args.INPUT_FILE)
    if not files:
        print(f"error: no images found in {args.INPUT_FILE!r}", file=sys.stderr)
        return 1
    os.makedirs(args.OUTPUT_FILE, exist_ok=True)
    out_paths = [os.path.join(args.OUTPUT_FILE, n)
                 for n in _output_names(files)]

    if args.downsample or args.parameters == "bilinear":
        if getattr(args, "mesh", None):
            # A silent single-device fallback would hand a user who
            # asked for N-chip sharding one chip with no diagnostic.
            print("error: --mesh is not supported for the bilinear/"
                  "downsample folder paths", file=sys.stderr)
            return 2
        images, keep = [], []
        for i, f in enumerate(files):
            try:
                images.append(load_image_u8(f))
                keep.append(i)
            except DECODE_ERRORS as e:
                print(f"skipping {f}: {e}", file=sys.stderr)
        if not images:
            print("error: no readable images", file=sys.stderr)
            return 1
        # non-neural paths: per-image loop over the ONE fixed-shape
        # tile executable (whole-image jit would recompile per size)
        from rusty_sr_tpu.parallel.tiling import tiled_simple
        verb = "Downsampling" if args.downsample else "Upscaling (bilinear)"
        print(f"{verb} {len(images)} images...", end="", flush=True)
        for img, i in zip(images, keep):
            if args.downsample:
                f = args.factor
                h, w, _ = img.shape
                out = tiled_simple(img[: h - h % f, : w - w % f], f,
                                   mode="downsample")
            else:
                out = tiled_simple(img, args.factor, mode="bilinear")
            save_image_u8(out_paths[i], out)
        print(" Done")
        return 0

    if args.custom:
        try:
            tree = params_lib.load_rsr_file(args.custom, args.factor)
        except ValueError as e:
            print(f"\nerror: {e}. Parameters selected do not have the size "
                  "required by the neural net. Ensure that the same factor "
                  "is used for upscaling and training.", file=sys.stderr)
            return 1
    else:
        tree = params_lib.load_builtin(args.parameters or "imagenet",
                                       args.factor)
    tree = {k: jnp.asarray(v) for k, v in tree.items()}
    engine = getattr(args, "engine", "xla")
    if engine != "xla":
        print(f"error: folder mode supports --engine xla only "
              f"(got {engine!r})", file=sys.stderr)
        return 2
    mesh = None
    if getattr(args, "mesh", None):
        try:
            mesh = _parse_mesh(args.mesh)
        except (ValueError, AssertionError) as e:
            print(f"error: bad --mesh {args.mesh!r}: {e}", file=sys.stderr)
            return 2
    _fast_tier_tip(args)
    print(f"Upscaling {len(files)} images (tiles batched across images"
          + (f", sharded over {mesh.shape['data']} devices" if mesh else "")
          + ")...", end="", flush=True)
    writer = _AsyncWriter()
    n_done = 0
    try:
        for group in _decoded_groups(files):
            idxs = [i for i, _ in group]
            imgs = [im for _, im in group]
            tiled_sr_batch(
                tree, imgs, args.factor, tile=args.tile, chunk=args.chunk,
                compute_dtype=jnp.bfloat16 if args.fast else None,
                mesh=mesh,
                on_image_done=lambda j, out, _ix=idxs: writer.submit(
                    out_paths[_ix[j]], out),
                release_outputs=True)
            n_done += len(group)
    finally:
        fails = writer.finish()
    for path, e in fails:
        print(f"\nCould not write output file: {path}: {e}",
              file=sys.stderr)
    if n_done == 0:
        print("\nerror: no readable images", file=sys.stderr)
        return 1
    print(" Done")
    return 0 if not fails else 1


def build_watch_parser() -> argparse.ArgumentParser:
    w = argparse.ArgumentParser(
        prog="rusty_sr_tpu watch",
        description="Serving mode: watch a folder and upscale every image "
                    "that appears in it. The process stays resident, so "
                    "weights and compiled TPU executables are loaded once "
                    "and every request after the first runs at full device "
                    "throughput (new arrivals are batched across images).")
    w.add_argument("INPUT_DIR", help="folder to watch for images")
    w.add_argument("OUTPUT_DIR", help="upscaled images are written here")
    w.add_argument("-p", "--parameters",
                   choices=["imagenet", "imagenetlinear", "anime"],
                   help="which built-in parameters to use")
    w.add_argument("-c", "--custom", metavar="PARAMETER_FILE",
                   help="custom parameter file (.rsr)")
    w.add_argument("-f", "--factor", type=int, default=3)
    w.add_argument("--fast", action="store_true",
                   help="bf16 packed trunk — ~7.7x the exact default "
                        "within the 0.05 dB quality budget (PERF.md)")
    w.add_argument("--tile", type=int, default=242)
    w.add_argument("--chunk", type=int, default=None)
    w.add_argument("--poll", type=float, default=1.0,
                   help="seconds between folder scans")
    w.add_argument("--once", action="store_true",
                   help="process the current folder contents and exit")
    w.add_argument("--mesh", metavar="SPEC", default=None,
                   help="shard each poll batch's tiles over a device "
                        "mesh: 'data=N' or just 'N' (batch-of-tiles "
                        "data parallelism; 'xla' engine only)")
    w.add_argument("--metrics", metavar="FILE", default=None,
                   help="append JSONL serving metrics per processed "
                        "batch (images, HR MPix, MPix/s, latency, "
                        "failures); large polls split into ~128 MB "
                        "LR groups, one record each")
    w.add_argument("--trace", metavar="DIR", default=None,
                   help="capture an XLA profiler trace of the run to DIR "
                        "(pair with --once for a bounded trace)")
    w.add_argument("--platform", choices=["tpu", "cpu"], default=None)
    return w


def run_watch(args) -> int:
    import time
    import jax.numpy as jnp
    from rusty_sr_tpu import params as params_lib
    from rusty_sr_tpu.parallel.tiling import tiled_sr_batch
    from rusty_sr_tpu.train.data import list_images
    if args.custom and args.parameters:
        print("error: --custom conflicts with --parameters", file=sys.stderr)
        return 2
    try:
        if args.custom:
            tree = params_lib.load_rsr_file(args.custom, args.factor)
        else:
            tree = params_lib.load_builtin(args.parameters or "imagenet",
                                           args.factor)
    except (OSError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    tree = {k: jnp.asarray(v) for k, v in tree.items()}
    compute_dtype = jnp.bfloat16 if args.fast else None
    mesh = None
    if getattr(args, "mesh", None):
        try:
            mesh = _parse_mesh(args.mesh)
        except (ValueError, AssertionError) as e:
            print(f"error: bad --mesh {args.mesh!r}: {e}", file=sys.stderr)
            return 2
    if not os.path.isdir(args.INPUT_DIR):
        print(f"error: {args.INPUT_DIR!r} is not a folder", file=sys.stderr)
        return 1
    os.makedirs(args.OUTPUT_DIR, exist_ok=True)
    _fast_tier_tip(args)
    mf = open(args.metrics, "a") if getattr(args, "metrics", None) else None

    done: dict = {}      # path -> mtime processed (or last failed attempt)
    fails: dict = {}     # path -> (mtime, attempt count); resets on mtime
    # change so a file that was mid-copy for >3 polls is retried once its
    # write completes instead of being blacklisted forever
    pick_name = _StableNamer()  # output names stable for the watcher's life
    print(f"Watching {args.INPUT_DIR} (poll {args.poll}s; Ctrl-C to stop)",
          flush=True)
    try:
        while True:
            pending = _watch_scan(args.INPUT_DIR, done, fails)
            # Decode per LR-byte-bounded group through the folder path's
            # decode-ahead pipeline (_decoded_groups): a watcher pointed
            # at a large pre-filled folder must not decode EVERY arrival
            # into host memory before the first device pass, and group
            # k+1 decodes while the device computes group k.
            def _on_decode_error(i, e, _pending=pending):
                # possibly still being written — retry next scans (runs
                # on the producer thread; dict ops are GIL-atomic and a
                # decode-failed path never also reaches the batch loop)
                f, mt = _pending[i]
                prev = fails.get(f)
                fc = prev[1] if prev and prev[0] == mt else 0
                fails[f] = (mt, fc + 1)
                if fc + 1 >= 3:
                    print(f"skipping {f}: {e}", file=sys.stderr)

            for group in _decoded_groups([f for f, _ in pending],
                                         on_error=_on_decode_error):
                batch_paths = [pending[i] for i, _ in group]
                batch_imgs = [im for _, im in group]
                t0 = time.time()
                names = [pick_name(f) for f, _ in batch_paths]
                # PNG encode rides a write-behind pool while later tile
                # chunks compute (see _AsyncWriter) — the per-image save
                # fires the moment that image's last tile drains.
                writer = _AsyncWriter()
                try:
                    tiled_sr_batch(tree, batch_imgs, args.factor,
                                   tile=args.tile, chunk=args.chunk,
                                   compute_dtype=compute_dtype,
                                   mesh=mesh,
                                   on_image_done=lambda j, out:
                                   writer.submit(
                                       os.path.join(args.OUTPUT_DIR,
                                                    names[j]), out),
                                   release_outputs=True)
                finally:
                    # an unwritable output (disk full, permissions) must
                    # not kill the resident watcher mid-batch: finish()
                    # collects (and joins the pool even on a device error)
                    failed = {p: e for p, e in writer.finish()}
                n_ok = 0
                for (f, mt), name in zip(batch_paths, names):
                    e = failed.get(os.path.join(args.OUTPUT_DIR, name))
                    if e is not None:
                        fails[f] = (mt, fails.get(f, (mt, 0))[1] + 1)
                        print(f"could not write {name}: {e}",
                              file=sys.stderr)
                        continue
                    done[f] = mt
                    fails.pop(f, None)
                    n_ok += 1
                dt = time.time() - t0
                px = sum(im.shape[0] * im.shape[1] for im in batch_imgs) \
                    * args.factor ** 2 / 1e6
                print(f"upscaled {n_ok} image(s), {px:.1f} HR MPix "
                      f"in {dt:.2f}s", flush=True)
                if mf is not None:
                    # JSONL serving observability (the reference has
                    # stdout only; SURVEY.md §5 metrics row)
                    import json
                    mf.write(json.dumps({
                        "images": n_ok, "failed": len(batch_imgs) - n_ok,
                        "hr_mpix": round(px, 3), "latency_s": round(dt, 4),
                        "mpix_per_s": round(px / max(dt, 1e-9), 2),
                        "wall": time.time()}) + "\n")
                    mf.flush()
            if args.once:
                return 0
            time.sleep(args.poll)
    except KeyboardInterrupt:
        print("\nDone")
        return 0
    finally:
        if mf is not None:
            mf.close()


def _watch_scan(input_dir: str, done: dict, fails: dict) -> list:
    """One watch poll: list the folder, decide what to (re)process, and
    prune bookkeeping to the CURRENT folder contents.

    ``done`` maps path -> processed mtime; ``fails`` maps path ->
    (mtime, attempt count), resetting when the mtime changes so a file
    that was mid-copy for >3 polls is retried once its write completes.
    Entries for files no longer present are dropped every poll — a
    months-long watcher on a churning folder keeps O(current folder)
    state (pinned in tests/test_cli.py).  Runs before the decode
    producer starts, so nothing touches ``fails`` concurrently here.
    """
    from rusty_sr_tpu.train.data import list_images

    pending = []   # (f, mtime) to process this poll
    current = set()
    for f in list_images(input_dir):
        current.add(f)
        try:
            mt = os.path.getmtime(f)
        except OSError:
            continue
        if done.get(f) == mt:
            continue
        fmt, fc = fails.get(f, (None, 0))
        if fmt is not None and fmt != mt:
            fc = 0    # file changed since the failures: retry
        if fc >= 3:
            continue
        pending.append((f, mt))
    for d in (done, fails):
        for f in [k for k in d if k not in current]:
            del d[f]
    return pending


def run_train(args) -> int:
    if args.val_max is not None and not args.val_folder:
        # clap: .requires("VALIDATION_FOLDER") (reference src/main.rs:109)
        print("error: --val_max requires --val_folder", file=sys.stderr)
        return 2
    resume_from = getattr(args, "resume", None)
    if resume_from == "":          # bare --resume: use --ckpt_dir
        if not args.ckpt_dir:
            print("error: --resume without a DIR requires --ckpt_dir",
                  file=sys.stderr)
            return 2
        resume_from = args.ckpt_dir
    if resume_from is not None and args.start:
        print("error: --resume conflicts with -s/--start (a native "
              "checkpoint already contains the parameters)",
              file=sys.stderr)
        return 2
    from rusty_sr_tpu import params as params_lib
    from rusty_sr_tpu.train.data import CropPipeline
    from rusty_sr_tpu.train.loop import TrainConfig, train_loop
    from rusty_sr_tpu.utils.imageio import load_image
    from rusty_sr_tpu.train.data import list_images

    dist = [args.coordinator, args.num_processes, args.process_id]
    if any(v is not None for v in dist):
        if any(v is None for v in dist):
            print("error: multi-host training needs all of --coordinator, "
                  "--num_processes and --process_id", file=sys.stderr)
            return 2
        import jax
        # Must precede any device query (jax.devices() finalises the
        # backend); after this, jax.devices() is the GLOBAL device list
        # and process_index()/process_count() drive the input striping
        # in train.data.ImageFolderSupplier.
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    mesh = None
    if args.mesh:
        try:
            mesh = _parse_mesh(args.mesh)
        except (ValueError, AssertionError) as e:
            print(f"error: bad --mesh {args.mesh!r}: {e}", file=sys.stderr)
            return 2

    cfg = TrainConfig(factor=args.factor, linear_loss=args.linear_loss,
                      loss_kind=args.loss, amp=getattr(args, "amp", False),
                      precision=getattr(args, "precision", "highest"),
                      trunk=getattr(args, "trunk", "merged"))
    for flag, arg_v, attr in (("--ckpt_every", args.ckpt_every, "checkpoint_every"),
                              ("--val_every", args.val_every, "val_every"),
                              ("--steps_per_dispatch",
                               getattr(args, "steps_per_dispatch", None),
                               "steps_per_dispatch")):
        if arg_v is not None:
            if arg_v < 1:
                print(f"error: {flag} must be >= 1 (got {arg_v})",
                      file=sys.stderr)
                return 2
            setattr(cfg, attr, arg_v)
    if args.batch is not None:
        if args.batch < 1:
            print(f"error: --batch must be >= 1 (got {args.batch})",
                  file=sys.stderr)
            return 2
        cfg.batch_size = args.batch
    if getattr(args, "crop", None) is not None:
        if args.crop < cfg.factor or args.crop % cfg.factor:
            print(f"error: --crop must be a positive multiple of the "
                  f"factor {cfg.factor} (got {args.crop})", file=sys.stderr)
            return 2
        if cfg.trunk == "packed" and (args.crop // cfg.factor) % 2:
            print(f"error: --trunk packed needs an even LR crop "
                  f"(--crop {args.crop} / factor {cfg.factor} = "
                  f"{args.crop // cfg.factor}, odd)", file=sys.stderr)
            return 2
        cfg.crop = args.crop
    cfg.remat = bool(getattr(args, "remat", False))

    import jax
    nproc = jax.process_count()
    is_main = jax.process_index() == 0
    if nproc > 1 and mesh is None:
        # multi-host default: pure DP over every global device
        from rusty_sr_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    if mesh is not None and cfg.batch_size % mesh.shape["data"] != 0:
        print(f"error: batch size {cfg.batch_size} does not divide over "
              f"mesh data={mesh.shape['data']} (use --batch)", file=sys.stderr)
        return 2
    if cfg.batch_size % nproc != 0:
        print(f"error: batch size {cfg.batch_size} does not divide over "
              f"{nproc} processes (use --batch)", file=sys.stderr)
        return 2

    try:
        # Production feed (train.data.CropPipeline): decoded-image cache
        # + N-worker crop pool, deterministic for any worker count.
        # Each host stripes the file list by process index
        # (train.data.shard_files_for_host) and feeds its LOCAL slice of
        # the global batch; train_loop assembles the global array.
        buf = CropPipeline(args.TRAINING_FOLDER, recurse=args.recurse,
                           crop=(cfg.crop, cfg.crop),
                           batch_size=cfg.batch_size // nproc,
                           seed=jax.process_index(),
                           workers=getattr(args, "data_workers", None),
                           out_dtype=np.uint8,   # 4x less H2D; device /255
                           shard_across_hosts=nproc > 1)
    except (ValueError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if nproc > 1:
        print(f"multi-host: process {jax.process_index()}/{nproc}, "
              f"{len(buf.files)} training files in this host's "
              "stripe", flush=True)

    start = None
    if args.start:
        try:
            start = params_lib.load_rsr_file(args.start, cfg.factor)
        except OSError as e:
            # reference: expect("Error opening start parameter file"), :191
            print(f"Error opening start parameter file: {e}", file=sys.stderr)
            return 1
        except ValueError as e:
            print(f"error: {e}. Ensure the start parameters were trained "
                  "with the same factor.", file=sys.stderr)
            return 1

    val_images = None
    if args.val_folder and is_main:   # validation/PSNR prints: main host only
        files = list_images(args.val_folder, args.recurse)
        if args.val_max is not None:
            files = files[: args.val_max]
        val_images = [load_image(f) for f in files]

    if is_main:
        print("Beginning Training")

    def batches():
        while True:
            b = buf.next_batch()
            if b is None:
                return
            yield b

    from rusty_sr_tpu.train.loop import RssBudgetExceeded
    try:
        train_loop(cfg, batches(), start_params=start,
                   param_file=args.PARAMETER_FILE if is_main else None,
                   val_images=val_images,
                   # uniform across processes even though only the main
                   # host loads val_images: the validation cadence shapes
                   # the dispatch-group size and gates a collective param
                   # gather, so every process must agree on it
                   validate=bool(args.val_folder),
                   max_steps=args.max_steps,
                   metrics_file=args.metrics if is_main else None,
                   # orbax saves are collective under multi-host (every
                   # process participates in the barrier; only the
                   # primary writes) — pass the dir on ALL processes.
                   native_ckpt_dir=args.ckpt_dir,
                   resume_from=resume_from,
                   max_rss_gb=getattr(args, "max_rss_gb", None),
                   log=print if is_main else (lambda s: None),
                   mesh=mesh)
    except RssBudgetExceeded as e:
        # Clean leak-tolerant stop: checkpoints are saved; rc 75
        # (EX_TEMPFAIL) tells a supervisor loop to relaunch with --resume.
        print(f"{e}", file=sys.stderr)
        return 75
    except OSError as e:
        # reference: expect("Could not make parameter file"), src/main.rs:212
        print(f"Could not make parameter file: {e}", file=sys.stderr)
        return 1
    except RuntimeError as e:
        # e.g. every training image unreadable (train/data.py)
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        buf.close()
    if is_main:
        print("Done")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # Subcommand negates the positional requirements (the reference's clap
    # uses SubcommandsNegateReqs, src/main.rs:38); argparse can't mix an
    # optional subcommand with required positionals, so dispatch manually.
    is_train = bool(argv) and argv[0] == "train"
    is_watch = bool(argv) and argv[0] == "watch"
    if is_watch:
        args = build_watch_parser().parse_args(argv[1:])
    elif is_train:
        args = build_train_parser().parse_args(argv[1:])
    else:
        args = build_parser().parse_args(argv)
    if args.platform:
        # Must precede any jax usage; JAX_PLATFORMS from the environment
        # (e.g. the axon plugin) would otherwise win.
        import jax
        jax.config.update("jax_platforms", args.platform)
    elif getattr(args, "coordinator", None) is None:
        # The host's TPU plugin registers per-process and can flake
        # transiently; recover by re-exec rather than crashing mid-run.
        # Skipped for multi-host runs: jax.distributed.initialize (in
        # run_train) must be the FIRST backend touch — probing
        # jax.devices() here would finalise the local backend and make
        # initialize() raise.
        from rusty_sr_tpu.utils.platform import ensure_device_or_respawn
        ensure_device_or_respawn()
    runner = (run_watch if is_watch else
              run_train if is_train else run_upscale)
    if getattr(args, "trace", None):
        from rusty_sr_tpu.utils.profiling import trace
        with trace(args.trace):
            return runner(args)
    return runner(args)


if __name__ == "__main__":
    sys.exit(main())

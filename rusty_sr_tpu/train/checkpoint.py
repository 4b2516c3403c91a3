"""Checkpointing: byte-compatible `.rsr` plus native orbax checkpoints.

The reference checkpoints the flat f32 vector to `.rsr` every 100 steps
(src/main.rs:210-217) and resumes from it (`--start`, src/main.rs:190-195).
SURVEY.md §5 calls for both that format and a native TPU-side checkpoint:
orbax adds atomic writes, optimizer state, and step metadata so training is
restartable mid-run (failure recovery), which `.rsr` alone cannot do.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from rusty_sr_tpu import params as params_lib

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False


def save_rsr(path: str, params, factor: int) -> None:
    """Reference-format checkpoint (SURVEY.md §8.1)."""
    host = jax.tree.map(np.asarray, params)
    params_lib.save_rsr_file(path, host, factor)


def save_native(ckpt_dir: str, step: int, params, opt_state: Any = None) -> None:
    """Atomic orbax checkpoint of params (+ optimizer state + step)."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax not available")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": jax.tree.map(np.asarray, params), "step": step}
    if opt_state is not None:
        payload["opt_state"] = jax.tree.map(np.asarray, opt_state)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def latest_native(ckpt_dir: str) -> Optional[str]:
    import re
    if not os.path.isdir(ckpt_dir):
        return None
    # step_\d+$ ONLY: a crash mid-save leaves an orbax tmp dir named
    # step_NNN.orbax-checkpoint-tmp-<ts> that a startswith filter would
    # sort LAST and resume from — the exact crash-recovery case these
    # checkpoints exist for must fall back to the last complete one.
    steps = sorted(d for d in os.listdir(ckpt_dir)
                   if re.fullmatch(r"step_\d+", d))
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def checkpoint_keys(path: str) -> set:
    """Top-level keys stored in a native checkpoint, from metadata only
    (no array data is read).  Lets resume decide whether optimizer state
    exists in the checkpoint instead of guessing from restore errors —
    a tree MISMATCH must surface as an error, not silently fall back to
    fresh Adam moments."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax not available")
    meta = ocp.StandardCheckpointer().metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    return set(tree.keys())


def restore_native(path: str, like: Any = None) -> Tuple[Any, Any, int]:
    """-> (params, opt_state or None, step)."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax not available")
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path, like) if like is not None else \
        ckptr.restore(path)
    return (payload["params"], payload.get("opt_state"),
            int(np.asarray(payload["step"])))

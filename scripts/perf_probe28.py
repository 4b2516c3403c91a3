"""Probe 28: XLA flag sweep over the production bench.

The pass is XLA-conv-emitter-bound (PERF.md); the one compiler-level
knob not yet tried is scoped VMEM, which bounds fusion sizes.  Each
config runs `bench.py` in a subprocess (XLA_FLAGS is process-level);
the compilation cache keys on flags so each config compiles fresh once.

RESULT: CLOSED on this backend.  The host XLA flag parser is CPU-only
and hard-rejects every --xla_tpu_* flag (`Unknown flag in XLA_FLAGS`,
F-level abort) because the TPU compile happens REMOTELY via the axon
tunnel; and the per-jit route (`jit(f).lower(x).compile(
compiler_options={"xla_tpu_scoped_vmem_limit_kib": ...})`) HANGS the
remote compile helper >10 min on a trivial 256x256 matmul (same failure
class as lax.conv at Precision.HIGHEST, CLAUDE.md).  TPU compiler knobs
are simply unreachable from this environment — baseline measured 592.3
MPix/s, nothing else runnable.
"""

import json
import os
import subprocess
import sys

CONFIGS = [
    ("baseline", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem128m", "--xla_tpu_scoped_vmem_limit_kib=131072"),
    ("vmem8m", "--xla_tpu_scoped_vmem_limit_kib=8192"),
]


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, flags in CONFIGS:
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(root, "bench.py")],
                capture_output=True, text=True, timeout=2400, env=env)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if line:
                v = json.loads(line[-1])
                print(f"{name:10s} {v['value']:8.1f} MPix/s", flush=True)
            else:
                print(f"{name:10s} NO-OUTPUT rc={out.returncode} "
                      f"{out.stderr.strip().splitlines()[-1][:160] if out.stderr.strip() else ''}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name:10s} TIMEOUT", flush=True)


if __name__ == "__main__":
    main()

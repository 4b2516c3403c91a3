"""Pallas TPU kernels: the fused SR trunk (all conv stages in one kernel,
activations resident in VMEM)."""

from rusty_sr_tpu.ops.pallas.trunk import fused_trunk, pack_trunk_weights  # noqa: F401

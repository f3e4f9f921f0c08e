"""Numerical hot-path kernels (L1): reference XLA ops + Pallas TPU kernels."""

from pycllp_tpu.ops.reference import (
    REFERENCE_KERNELS,
    KernelSet,
    NormalFactor,
    PreparedA,
    ReferenceKernels,
)

__all__ = [
    "REFERENCE_KERNELS",
    "KernelSet",
    "NormalFactor",
    "PreparedA",
    "ReferenceKernels",
]

"""Numerical hot-path kernels (L1): reference XLA ops + Pallas TPU kernels."""

from pycllp_tpu.ops.reference import (
    REFERENCE_KERNELS,
    KernelSet,
    chol_solve,
    cholesky,
    form_normal,
    mv,
    rmv,
)

__all__ = [
    "REFERENCE_KERNELS",
    "KernelSet",
    "chol_solve",
    "cholesky",
    "form_normal",
    "mv",
    "rmv",
]

"""Reference (pure-jnp/XLA) implementations of the IPM hot-path ops.

These define the kernel interface contract; the Pallas implementations in
:mod:`pycllp_tpu.ops.normal_eq` / :mod:`pycllp_tpu.ops.cholesky` /
:mod:`pycllp_tpu.ops.trsm` swap in behind the same signatures (the
upstream analogue is the NumPy-vs-vendored-C-vs-OpenCL backend split;
reference mount empty this build — SURVEY.md §0).

Shape convention: a leading instance/batch axis ``...`` on every array;
``A`` may omit it (shared structure across scenarios — the stochastic-LP
case, BASELINE.json config 5).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = [
    "mv",
    "rmv",
    "form_normal",
    "cholesky",
    "chol_solve",
    "KernelSet",
    "REFERENCE_KERNELS",
]


def mv(A, x):
    """Batched ``A @ x``: (..., m, n) @ (..., n) → (..., m)."""
    return jnp.einsum("...mn,...n->...m", A, x)


def rmv(A, y):
    """Batched ``Aᵀ @ y``: (..., m, n)ᵀ @ (..., m) → (..., n)."""
    return jnp.einsum("...mn,...m->...n", A, y)


def form_normal(A, d, reg_eps: float):
    """Normal-equations matrix ``M = A·diag(d)·Aᵀ + δI``.

    ``d`` is the (positive) scaling vector x/z.  The Tikhonov term
    ``δ = reg_eps · max(diag M)`` is relative to the per-instance diagonal
    so one static knob covers wildly different μ regimes (the analogue of
    the dynamic small-pivot regularization in sparse LDLᵀ codes).
    """
    M = jnp.einsum("...mn,...n,...kn->...mk", A, d, A)
    m = M.shape[-1]
    eye = jnp.eye(m, dtype=M.dtype)
    diag_max = jnp.max(jnp.einsum("...ii->...i", M), axis=-1)
    return M + (reg_eps * diag_max)[..., None, None] * eye


def cholesky(M):
    """Batched lower Cholesky factor of (..., m, m)."""
    return lax.linalg.cholesky(M)


def chol_solve(L, r):
    """Solve ``L Lᵀ v = r`` for batched L (..., m, m), r (..., m)."""
    r2 = r[..., None]
    t = lax.linalg.triangular_solve(L, r2, left_side=True, lower=True)
    v = lax.linalg.triangular_solve(L, t, left_side=True, lower=True, transpose_a=True)
    return v[..., 0]


class KernelSet:
    """Pluggable hot-path kernel bundle consumed by the HSD core."""

    def __init__(self, *, mv=mv, rmv=rmv, form_normal=form_normal, cholesky=cholesky, chol_solve=chol_solve, name="reference"):
        self.mv = mv
        self.rmv = rmv
        self.form_normal = form_normal
        self.cholesky = cholesky
        self.chol_solve = chol_solve
        self.name = name

    def __repr__(self):
        return f"KernelSet({self.name})"


REFERENCE_KERNELS = KernelSet()

"""Reference (pure-jnp/XLA) implementation of the IPM hot-path kernel set.

Defines the kernel interface contract; the Pallas batch-last kernels in
:mod:`pycllp_tpu.ops.batchlast` implement the same interface (the
upstream analogue is the NumPy-vs-vendored-C-vs-OpenCL backend split;
reference mount empty this build — SURVEY.md §0).

Interface (all arrays carry a leading instance axis ``...`` unless
stated; ``A`` may omit it — shared structure across scenarios):

* ``prepare(A) -> ctx`` — once per structure, outside the IPM loop
  (precomputed products live here; XLA hoists them but Pallas paths
  need them materialised).
* ``mv(ctx, x)`` / ``rmv(ctx, y)`` — ``A @ x`` / ``Aᵀ @ y``.
* ``factor(ctx, d, reg_eps) -> fac`` — factorize the normal matrix
  ``M = A·diag(d)·Aᵀ + δI`` with ``δ = reg_eps · max(diag)`` per
  instance (the analogue of dynamic small-pivot regularization in
  sparse LDLᵀ codes).  ``fac`` is opaque.
* ``solve(fac, rs) -> tuple`` — apply ``M⁻¹`` to each RHS in the tuple
  (multi-RHS so factorization traffic is shared).
* ``matvec_M(fac, v)`` — apply ``M`` (for iterative refinement), via
  the identity ``M v = A(d ⊙ Aᵀv) + δv`` so M is never materialised.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
from jax import lax

__all__ = ["KernelSet", "ReferenceKernels", "REFERENCE_KERNELS"]


class PreparedA(NamedTuple):
    A: Any  # (..., m, n)
    Asq: Any  # (..., m, n) — elementwise A², for diag(M) = A²·d


class NormalFactor(NamedTuple):
    ctx: PreparedA
    L: Any  # (..., m, m) lower Cholesky factor
    d: Any  # (..., n) scaling at factorization
    reg: Any  # (...,) diagonal shift δ


class KernelSet:
    """Abstract hot-path kernel bundle consumed by the HSD core.

    Implementations must be hashable singletons (used as static jit
    args); statelessness is assumed.
    """

    name = "abstract"

    def prepare(self, A) -> PreparedA:
        raise NotImplementedError

    def mv(self, ctx: PreparedA, x):
        raise NotImplementedError

    def rmv(self, ctx: PreparedA, y):
        raise NotImplementedError

    def factor(self, ctx: PreparedA, d, reg_eps: float) -> NormalFactor:
        raise NotImplementedError

    def solve(self, fac: NormalFactor, rs: tuple) -> tuple:
        raise NotImplementedError

    def factor_and_solve(self, ctx: PreparedA, d, reg_eps: float, rs: tuple):
        """Factorize and solve the first RHS batch; implementations may
        fuse the two (one kernel launch, factor kept in VMEM)."""
        fac = self.factor(ctx, d, reg_eps)
        return fac, self.solve(fac, rs)

    def matvec_M(self, fac: NormalFactor, v):
        ctx = fac.ctx
        return self.mv(ctx, fac.d * self.rmv(ctx, v)) + fac.reg[..., None] * v

    def finish_kernels(self, which: str = "df64") -> "KernelSet":
        """Kernel set for the wide-dtype finish phase (default: self).

        Implementations whose fast path is narrow-only override this to
        return a wide-capable sibling selected by ``which``
        (``SolverOptions.finish_kset``); sets that are already
        wide-capable ignore the selector."""
        return self

    def __repr__(self):
        return f"KernelSet({self.name})"


class ReferenceKernels(KernelSet):
    """XLA-native implementation: einsum + lax.linalg batched primitives."""

    name = "reference"

    def prepare(self, A) -> PreparedA:
        return PreparedA(A=A, Asq=A * A)

    def mv(self, ctx, x):
        return jnp.einsum("...mn,...n->...m", ctx.A, x)

    def rmv(self, ctx, y):
        return jnp.einsum("...mn,...m->...n", ctx.A, y)

    def factor(self, ctx, d, reg_eps):
        A = ctx.A
        M = jnp.einsum("...mn,...n,...kn->...mk", A, d, A)
        diag = jnp.einsum("...mn,...n->...m", ctx.Asq, d)
        reg = reg_eps * jnp.max(diag, axis=-1)
        m = M.shape[-1]
        M = M + reg[..., None, None] * jnp.eye(m, dtype=M.dtype)
        L = lax.linalg.cholesky(M)
        return NormalFactor(ctx=ctx, L=L, d=d, reg=reg)

    def solve(self, fac, rs):
        L = fac.L
        out = []
        for r in rs:
            r2 = r[..., None]
            t = lax.linalg.triangular_solve(L, r2, left_side=True, lower=True)
            v = lax.linalg.triangular_solve(
                L, t, left_side=True, lower=True, transpose_a=True
            )
            out.append(v[..., 0])
        return tuple(out)


REFERENCE_KERNELS = ReferenceKernels()

"""Mixed-precision kernel set: f32 Pallas factorizations, f64 refinement.

The finish-phase engine behind the 1e-6 correctness contract at f32
throughput (upstream contract: pycllp's default 1e-6 relative optimality
tolerance on its test LP set; reference mount empty this build —
SURVEY.md §0, BASELINE.md "Correctness" row).

TPU v5e has no hardware f64: XLA emulates it, and an emulated f64 matmul
runs ~65x slower than f32 (measured 2.3 vs 151 TFLOP/s on this chip), so
a straight f64 finish phase would erase the batched-throughput win.  But
f64 *elementwise* ops are only ~2x f32 (both HBM-bound), and the IPM's
O(m³·B) work is exactly one place: the normal-matrix factorization.

This kernel set therefore implements the :class:`KernelSet` contract at
f64 working precision while running ALL factorization and triangular-
substitution FLOPs in the f32 Pallas batch-last kernels.  Each solve is
three-precision iterative refinement (Carson & Higham 2018 structure):

    v₀ = P⁻¹ r                      (P = f32 Cholesky of M+δI, rounded)
    vₖ₊₁ = vₖ + P⁻¹ (r − M̂ vₖ)      (residual in f64, M̂ = A·D·Aᵀ + δI)

where the f64 residual costs two O(m·n·B) matvecs — cheap next to the
O(m³·B/3) factorization that stays in f32.  Convergence: the error
contracts by ~cond(M̂)·ε_f32 per sweep, and the relative regularization
δ = reg_eps·max(diag) bounds cond(M̂+δI) ≤ ~1/reg_eps ≈ 5e5, giving
≥1.5 digits per sweep; ``ir_steps=2`` reaches f64-level backward error
on the δ-regularized system.  (The δ-shift itself is the standard
primal-dual regularization every production IPM carries; the solver's
optional ``kkt_refine`` corrects at the KKT level if ever needed.)
"""

from __future__ import annotations

import typing

import jax.numpy as jnp

from pycllp_tpu.ops.reference import KernelSet

__all__ = ["MixedPrecisionKernels", "MIXED_FINISH_KERNELS"]


class PreparedMixed(typing.NamedTuple):
    """Wide-precision operator data + the base kernel set's f32 context."""

    A: typing.Any  # (…, m, n) wide (f64) — residual/matvec precision
    Asq: typing.Any  # (…, m, n) wide, elementwise A² for diag(M)
    lo: typing.Any  # base.prepare(A.astype(f32)) — factorization context


class MixedFactor(typing.NamedTuple):
    ctx: PreparedMixed
    fac_lo: typing.Any  # base kernel set's f32 factorization
    d: typing.Any  # (…, n) wide scaling at factorization
    reg: typing.Any  # (…,) wide diagonal shift δ (same relative ε as f32)


class MixedPrecisionKernels(KernelSet):
    """f64-interface kernels whose O(m³) work runs in the f32 base set."""

    name = "mixed_finish"

    def __init__(self, base: KernelSet, ir_steps: int = 3, lo_reg_floor: float = 2e-6):
        self.base = base
        self.ir_steps = ir_steps
        # The f32 factor needs enough diagonal shift to stay PSD under
        # f32 rounding regardless of how tiny the wide phase's δ is; IR
        # then converges THROUGH the floor: the factor is only a
        # preconditioner, the residual operator (wide δ) defines the
        # system, and the contraction ‖I−P⁻¹M̂‖ ≈ δ_lo/(λ_min+δ_lo) < 1.
        self.lo_reg_floor = lo_reg_floor
        self.name = f"mixed_finish({base.name}, ir={ir_steps})"

    # -- wide-precision operator ------------------------------------------
    def prepare(self, A):
        A = jnp.asarray(A)
        return PreparedMixed(
            A=A, Asq=A * A, lo=self.base.prepare(A.astype(jnp.float32))
        )

    def mv(self, ctx, x):
        return jnp.einsum("...mn,...n->...m", ctx.A, x)

    def rmv(self, ctx, y):
        return jnp.einsum("...mn,...m->...n", ctx.A, y)

    # -- factor in f32, refine in f64 --------------------------------------
    def factor(self, ctx, d, reg_eps):
        if not isinstance(ctx, PreparedMixed):  # plain context (oracle path)
            ctx = PreparedMixed(A=ctx.A, Asq=ctx.Asq, lo=self.base.prepare(
                ctx.A.astype(jnp.float32)))
        diag = jnp.einsum("...mn,...n->...m", ctx.Asq, d)
        reg = reg_eps * jnp.max(diag, axis=-1)
        fac_lo = self.base.factor(
            ctx.lo, d.astype(jnp.float32), max(reg_eps, self.lo_reg_floor)
        )
        return MixedFactor(ctx=ctx, fac_lo=fac_lo, d=d, reg=reg)

    def solve(self, fac, rs):
        wide = rs[0].dtype
        vs = tuple(
            v.astype(wide)
            for v in self.base.solve(fac.fac_lo, tuple(r.astype(jnp.float32) for r in rs))
        )
        for _ in range(self.ir_steps):
            es = tuple(r - self.matvec_M(fac, v) for r, v in zip(rs, vs))
            cs = self.base.solve(fac.fac_lo, tuple(e.astype(jnp.float32) for e in es))
            vs = tuple(v + c.astype(wide) for v, c in zip(vs, cs))
        return vs

    # matvec_M: inherited — runs in wide precision via self.mv/rmv on
    # fac.ctx (A, d, reg all wide), defining the system IR converges to.


def _default_mixed():
    from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS

    return MixedPrecisionKernels(BATCHLAST_KERNELS)


MIXED_FINISH_KERNELS = _default_mixed()

"""Mixed-precision kernel set: f32 Pallas factorizations, f64 refinement.

Two roles (upstream contract: pycllp's default 1e-6 relative optimality
tolerance on its test LP set; reference mount empty this build —
SURVEY.md §0, BASELINE.md "Correctness" row):

* **Shipping role — the crossover basis-solve engine**
  (``SolverOptions.crossover_kset`` default "mixed1"): the vertex-crossover
  finish solves ``B·Bᵀ``-systems whose diagonal is a 0/1 basis
  indicator, so cond(M) = κ(B)² stays moderate and the f32-factor +
  f64-IR scheme below converges well past the 1e-9 vertex verification
  bound — at ~1/10 the cost of a df64 factorization per lane.
* **Documented negative result — the wide IPM finish**: for the
  late-IPM normal matrix (D = x/z spans ~1/μ²), the f32 PSD-safety
  shift makes IR stagnate at ~3e-4 (measured, exp_finish_debug2) — the
  IPM finish therefore uses the df64 set instead
  (``finish_kset="df64"``).

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

__all__ = ["MixedPrecisionKernels", "MIXED_FINISH_KERNELS", "MIXED_IR1_KERNELS"]


class PreparedMixed(typing.NamedTuple):
    """Wide-precision operator data + the base kernel set's f32 context."""

    A: typing.Any  # (…, m, n) wide (f64) — residual/matvec precision
    Asq: typing.Any  # (…, m, n) wide, elementwise A² for diag(M)
    lo: typing.Any  # base.prepare(A.astype(f32)) — factorization context
    Amv: typing.Any = None  # Ozaki slice groups of A / Aᵀ: exact-GEMM f64
    Armv: typing.Any = None  # matvecs on the MXU (shared 2-D A on TPU
    # paths; XLA's emulated-f64 einsum is ~65x slower than f32 and was
    # measured to dominate the whole crossover stage — same rationale
    # and machinery as ops/df64.py's Amv/Armv)


class MixedFactor(typing.NamedTuple):
    ctx: PreparedMixed
    fac_lo: typing.Any  # base kernel set's f32 factorization
    d: typing.Any  # (…, n) wide scaling at factorization
    reg: typing.Any  # (…,) wide diagonal shift δ (same relative ε as f32)
    s: typing.Any = None  # (…, m) wide Jacobi row scale of the f32 factor
    # (None = unscaled): the factor holds chol(S·M·S + δI) and the
    # preconditioner application is P⁻¹r = S·(LLᵀ)⁻¹·(S·r)


class MixedPrecisionKernels(KernelSet):
    """f64-interface kernels whose O(m³) work runs in the f32 base set."""

    name = "mixed_finish"

    def __init__(
        self,
        base: KernelSet,
        ir_steps: int = 3,
        lo_reg_floor: float = 2e-6,
        jacobi: bool = True,
    ):
        self.base = base
        self.ir_steps = ir_steps
        # The f32 factor needs enough diagonal shift to stay PSD under
        # f32 rounding regardless of how tiny the wide phase's δ is; IR
        # then converges THROUGH the floor: the factor is only a
        # preconditioner, the residual operator (wide δ) defines the
        # system, and the contraction ‖I−P⁻¹M̂‖ ≈ δ_lo/(λ_min+δ_lo) < 1.
        self.lo_reg_floor = lo_reg_floor
        # Jacobi (symmetric diagonal) equilibration of the f32 factor:
        # factor S·M·S + δI with S = diag(M)^(-1/2) instead of M + δ·
        # max(diag)·I.  Two effects on the IR contraction: (a) van der
        # Sluis — κ(SMS) is within a factor m of the best diagonally
        # scaled κ, so scaling-induced conditioning (unbalanced basis
        # row norms: diag(M)ᵢ = ‖Bᵢ,·‖²) disappears from the ε_f32·κ
        # term; (b) the PSD-safety shift δ becomes RELATIVE per row
        # (S⁻¹δS⁻¹ in the unscaled space) instead of max-diag-uniform,
        # so small-row lanes stop being drowned by a shift sized for
        # their largest row.  The hard-reject population this targets
        # (VERDICT r4 item 2) is exactly the high-κ(B)² tail whose
        # mixed-precision IR diverged.  Intrinsic near-degeneracy (near
        # linearly dependent basis columns) is NOT fixed by any diagonal
        # scaling — those lanes still fall through to the df64 tiers.
        self.jacobi = jacobi
        self.name = f"mixed_finish({base.name}, ir={ir_steps}{', jacobi' if jacobi else ''})"

    # -- wide-precision operator ------------------------------------------
    def prepare(self, A):
        A = jnp.asarray(A)
        Amv = Armv = None
        if A.ndim == 2 and A.dtype == jnp.float64:
            from pycllp_tpu.ops.df64 import _ozaki_prepare, ozaki_mv_params

            m, n = A.shape
            sm, nm, cm = ozaki_mv_params(n)
            sr, nr, cr = ozaki_mv_params(m)
            Amv = _ozaki_prepare(A, s=sm, n_slices=nm, cut=cm)
            Armv = _ozaki_prepare(A.T, s=sr, n_slices=nr, cut=cr)
        return PreparedMixed(
            A=A, Asq=A * A, lo=self.base.prepare(A.astype(jnp.float32)),
            Amv=Amv, Armv=Armv,
        )

    def mv(self, ctx, x):
        if getattr(ctx, "Amv", None) is None or x.ndim != 2:
            return jnp.einsum("...mn,...n->...m", ctx.A, x)
        from pycllp_tpu.ops.df64 import _ozaki_matmul, ozaki_mv_params

        s, n_slices, cut = ozaki_mv_params(ctx.A.shape[-1])
        return _ozaki_matmul(
            ctx.Amv[0], ctx.Amv[1], x.T, s=s, n_slices=n_slices, cut=cut
        ).T

    def rmv(self, ctx, y):
        if getattr(ctx, "Armv", None) is None or y.ndim != 2:
            return jnp.einsum("...mn,...m->...n", ctx.A, y)
        from pycllp_tpu.ops.df64 import _ozaki_matmul, ozaki_mv_params

        s, n_slices, cut = ozaki_mv_params(ctx.A.shape[-2])
        return _ozaki_matmul(
            ctx.Armv[0], ctx.Armv[1], y.T, s=s, n_slices=n_slices, cut=cut
        ).T

    # -- factor in f32, refine in f64 --------------------------------------
    def factor(self, ctx, d, reg_eps):
        if not isinstance(ctx, PreparedMixed):  # plain context (oracle path)
            ctx = PreparedMixed(A=ctx.A, Asq=ctx.Asq, lo=self.base.prepare(
                ctx.A.astype(jnp.float32)))
        diag = jnp.einsum("...mn,...n->...m", ctx.Asq, d)
        reg = reg_eps * jnp.max(diag, axis=-1)
        lo = ctx.lo
        if self.jacobi and getattr(lo, "W", None) is not None:
            # shared-A batch-last context: form the f32 normal matrix via
            # the W-trick, equilibrate, factor with the lane-vectorised
            # Pallas Cholesky.  (Per-instance 3-D A and non-batch-last
            # bases fall through to the unscaled base factor below.)
            from pycllp_tpu.ops.batchlast import BLFactor, _chol_bl, _pad_lanes

            m = lo.A.shape[0]
            B = d.shape[0]
            wide = d.dtype
            tiny = jnp.asarray(jnp.finfo(wide).tiny, wide)
            s = 1.0 / jnp.sqrt(jnp.maximum(diag, tiny))
            dT, Bp = _pad_lanes(d.astype(jnp.float32).T, B)
            sT, _ = _pad_lanes(s.astype(jnp.float32).T, B)
            M = (lo.W @ dT).reshape(m, m, Bp)
            M = M * sT[:, None, :] * sT[None, :, :]
            # scaled diag(SMS) = 1 exactly → the PSD-safety shift is the
            # relative floor itself
            shift = jnp.full((Bp,), max(reg_eps, self.lo_reg_floor), jnp.float32)
            L, dinv = _chol_bl(M, shift, m=m)
            fac_lo = BLFactor(
                ctx=lo, L=L, dinv_diag=dinv, d=d.astype(jnp.float32), reg=shift[:B]
            )
            return MixedFactor(ctx=ctx, fac_lo=fac_lo, d=d, reg=reg, s=s)
        fac_lo = self.base.factor(
            lo, d.astype(jnp.float32), max(reg_eps, self.lo_reg_floor)
        )
        return MixedFactor(ctx=ctx, fac_lo=fac_lo, d=d, reg=reg)

    def _lo_solve(self, fac, rs):
        """Apply the f32 preconditioner to wide residuals (f32 out).

        Unscaled: (M+δI)⁻¹ via the base solve.  Jacobi: the factor holds
        chol(S·M·S + δI), so P⁻¹r = S·(LLᵀ)⁻¹·(S·r).
        """
        if fac.s is None:
            return self.base.solve(
                fac.fac_lo, tuple(r.astype(jnp.float32) for r in rs)
            )
        s32 = fac.s.astype(jnp.float32)
        vs = self.base.solve(
            fac.fac_lo, tuple((r * fac.s).astype(jnp.float32) for r in rs)
        )
        return tuple(v * s32 for v in vs)

    def solve(self, fac, rs):
        wide = rs[0].dtype
        k = len(rs)
        vs = tuple(v.astype(wide) for v in self._lo_solve(fac, rs))
        if not self.ir_steps:
            return vs
        if k > 1 and getattr(fac.ctx.A, "ndim", 2) != 2:
            # per-instance (B, m, n) A: the stacked sweep below would
            # broadcast the einsum batch B against k·B and fail at trace
            # time — refine each RHS through matvec_M instead (the
            # stacked path's win is launch count on the SHARED-A Ozaki
            # matvecs, which the 3-D path doesn't use anyway).
            for _ in range(self.ir_steps):
                es = tuple(r - self.matvec_M(fac, v) for r, v in zip(rs, vs))
                cs = self._lo_solve(fac, es)
                vs = tuple(v + c.astype(wide) for v, c in zip(vs, cs))
            return vs
        # one stacked IR residual per sweep: the k RHS share A and d, so
        # M·[v₁;…;vₖ] is one (k·B)-batch mv/rmv pair instead of k — the
        # matvec launch, not its FLOPs, is the unit cost at these shapes
        # (experiments/exp_crossover_cost.py)
        d_k = jnp.concatenate([fac.d] * k, axis=0) if k > 1 else fac.d
        reg_k = jnp.concatenate([fac.reg] * k, axis=0) if k > 1 else fac.reg
        ctx = fac.ctx
        for _ in range(self.ir_steps):
            V = jnp.concatenate(vs, axis=0) if k > 1 else vs[0]
            MV = self.mv(ctx, d_k * self.rmv(ctx, V)) + reg_k[..., None] * V
            R = jnp.concatenate(rs, axis=0) if k > 1 else rs[0]
            E = R - MV
            es = tuple(E[i * rs[0].shape[0]:(i + 1) * rs[0].shape[0]] for i in range(k))
            cs = self._lo_solve(fac, es)
            vs = tuple(v + c.astype(wide) for v, c in zip(vs, cs))
        return vs

    # matvec_M: inherited — runs in wide precision via self.mv/rmv on
    # fac.ctx (A, d, reg all wide), defining the system IR converges to.


def _default_mixed(ir_steps: int = 3):
    from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS

    return MixedPrecisionKernels(BATCHLAST_KERNELS, ir_steps=ir_steps)


MIXED_FINISH_KERNELS = _default_mixed()
# crossover-economy sibling: the vertex crossover layers its own
# true-residual refinement sweeps (crossover_refine) on top of each
# solve, so one inner IR sweep suffices — every sweep saved is 2 Ozaki
# matvecs + an f32 solve pair per RHS at full batch width
MIXED_IR1_KERNELS = _default_mixed(ir_steps=1)

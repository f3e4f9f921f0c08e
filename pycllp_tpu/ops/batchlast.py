"""Pallas TPU kernels for the IPM hot path — batch-LAST layout.

The TPU-native analogue of pycllp's OpenCL work-item-per-LP kernels
(SURVEY.md §2.2: ``pycllp/cl/*.cl`` → Pallas; reference mount empty this
build — SURVEY.md §0).  Key layout decision: instances live on the
**lane** dimension.

* With shared structure, ``M = A·diag(d)·Aᵀ`` collapses to ONE matmul:
  ``M[(i,j), b] = Σ_n (A[i,n]·A[j,n]) · d[n,b] = (W @ dᵀ)[(i,j), b]``
  where ``W[(i,j), n] = A[i,n]·A[j,n]`` is precomputed once per
  structure.  The (m², n) @ (n, B) product is exactly MXU-shaped AND
  lands in batch-last layout.
* Cholesky + triangular solves are then scalar algorithms vectorised
  over 128 instance-lanes on the VPU — each scalar op of the textbook
  factorization becomes one vector op across instances.  This is the
  same occupancy model as the OpenCL reference (per-work-item dense
  factorization), mapped to lane parallelism.
* The factorization never materialises M in HBM: the fused kernel does
  matmul → in-VMEM factor → solve, writing only L (for the corrector
  pass) and the solutions.

Grid: one block per 128-lane instance chunk; A/W are broadcast blocks.
"""

from __future__ import annotations

import functools
import typing

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pycllp_tpu.ops.reference import (
    KernelSet,
    NormalFactor,
    PreparedA,
    ReferenceKernels,
    REFERENCE_KERNELS,
)

__all__ = ["BatchLastKernels", "BATCHLAST_KERNELS", "BATCHLAST_FUSED_KERNELS"]

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _chol_body(l_ref, dinv_ref, reg, m: int):
    """In-place batch-lane Cholesky of the VMEM block in ``l_ref``.

    Right-looking; every scalar step of the textbook algorithm is one
    VPU vector op across the instance lanes.  δ (``reg``, per-lane) is
    added at each diagonal's single read — algebraically identical to
    factoring M + δI.  Non-PSD lanes turn NaN and are caught by the
    solver's numerical guard.
    """
    nan = jnp.asarray(jnp.nan, l_ref.dtype)
    for k in range(m):
        akk = l_ref[k, k, :] + reg
        pos = akk > 0
        sq = jnp.sqrt(jnp.where(pos, akk, 1.0))
        inv = jnp.where(pos, 1.0 / sq, nan)
        l_ref[k, k, :] = jnp.where(pos, sq, nan)
        dinv_ref[k, :] = inv
        if k + 1 < m:
            col = l_ref[k + 1 :, k, :] * inv[None, :]
            l_ref[k + 1 :, k, :] = col
            l_ref[k + 1 :, k + 1 :, :] = (
                l_ref[k + 1 :, k + 1 :, :] - col[:, None, :] * col[None, :, :]
            )


def _fused_factor_kernel(w_ref, dt_ref, reg_ref, l_ref, dinv_ref, *, m: int):
    """M = W @ dᵀ on the MXU (never touching HBM), then factor in VMEM."""
    lanes = dt_ref.shape[-1]
    mflat = jnp.dot(w_ref[:], dt_ref[:], preferred_element_type=l_ref.dtype)
    l_ref[:] = mflat.reshape(m, m, lanes)
    _chol_body(l_ref, dinv_ref, reg_ref[0, :], m)


def _chol_kernel(m_ref, reg_ref, l_ref, dinv_ref, *, m: int):
    """Factor an XLA-formed M block (M = (W @ dᵀ).reshape is ~1ms in XLA)."""
    l_ref[:] = m_ref[:]
    _chol_body(l_ref, dinv_ref, reg_ref[0, :], m)


def _facsol_kernel(m_ref, reg_ref, r_ref, l_ref, dinv_ref, v_ref, *, m: int, k_rhs: int):
    """Fused factor + k_rhs solves in one kernel launch.

    The forward substitution interleaves into the factorization's column
    sweep: when column k is computed it is still in registers, so the
    RHS update costs no extra memory traffic; only the backward pass
    (row-access) remains after the factor loop.  ``m_ref`` is aliased to
    ``l_ref`` (input_output_aliases) so the block fits VMEM with
    double-buffering.
    """
    l_ref[:] = m_ref[:]
    v_ref[:] = r_ref[:]
    reg = reg_ref[0, :]
    nan = jnp.asarray(jnp.nan, l_ref.dtype)
    for k in range(m):
        akk = l_ref[k, k, :] + reg
        pos = akk > 0
        sq = jnp.sqrt(jnp.where(pos, akk, 1.0))
        inv = jnp.where(pos, 1.0 / sq, nan)
        l_ref[k, k, :] = jnp.where(pos, sq, nan)
        dinv_ref[k, :] = inv
        wk = v_ref[:, k, :] * inv[None, :]
        v_ref[:, k, :] = wk
        if k + 1 < m:
            col = l_ref[k + 1 :, k, :] * inv[None, :]
            l_ref[k + 1 :, k, :] = col
            l_ref[k + 1 :, k + 1 :, :] = (
                l_ref[k + 1 :, k + 1 :, :] - col[:, None, :] * col[None, :, :]
            )
            v_ref[:, k + 1 :, :] = v_ref[:, k + 1 :, :] - col[None, :, :] * wk[:, None, :]
    for i in reversed(range(m)):
        vi = v_ref[:, i, :] * dinv_ref[i, :][None, :]
        v_ref[:, i, :] = vi
        if i > 0:
            v_ref[:, :i, :] = (
                v_ref[:, :i, :] - l_ref[i, :i, :][None, :, :] * vi[:, None, :]
            )


def _solve_kernel(l_ref, dinv_ref, r_ref, v_ref, *, m: int, k_rhs: int):
    """Solve L Lᵀ v = r for k_rhs stacked RHS, batch-lane vectorised.

    ROW-access only: column slices of a (m, m, LANES) block gather
    across sublane tiles and are ~20x slower (measured on v5e), so the
    forward pass is left-looking (dot with row L[i, :i]) and the
    backward pass right-looking (update with row L[i, :i] of Lᵀ's
    column) — both touch L by rows.  Divisions use the reciprocal
    diagonal saved by the factor kernel.

    l_ref: (m, m, LANES); dinv_ref: (m, LANES);
    r_ref/v_ref: (k_rhs, m, LANES).
    """
    v_ref[:] = r_ref[:]
    # forward, left-looking: w[i] = (r[i] − L[i,:i]·w[:i]) · dinv[i]
    for i in range(m):
        di = dinv_ref[i, :]
        if i > 0:
            acc = jnp.sum(l_ref[i, :i, :][None, :, :] * v_ref[:, :i, :], axis=1)
            v_ref[:, i, :] = (v_ref[:, i, :] - acc) * di[None, :]
        else:
            v_ref[:, i, :] = v_ref[:, i, :] * di[None, :]
    # backward, right-looking: v[i] = w[i]·dinv[i]; w[:i] −= L[i,:i]·v[i]
    for i in reversed(range(m)):
        vi = v_ref[:, i, :] * dinv_ref[i, :][None, :]
        v_ref[:, i, :] = vi
        if i > 0:
            v_ref[:, :i, :] = (
                v_ref[:, :i, :] - l_ref[i, :i, :][None, :, :] * vi[:, None, :]
            )


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _z(i):
    # index-map zero derived from the grid index: a literal Python 0
    # traces to i64 under jax_enable_x64 and Mosaic cannot legalize the
    # resulting (i64, …) index-map return (the grid index itself stays
    # i32) — `i - i` keeps the zero in the grid index's dtype.
    return i - i


def _lp_specs(m, k_rhs=None):
    l_spec = pl.BlockSpec((m, m, LANES), lambda i: (_z(i), _z(i), i), memory_space=pltpu.VMEM)
    dinv_spec = pl.BlockSpec((m, LANES), lambda i: (_z(i), i), memory_space=pltpu.VMEM)
    reg_spec = pl.BlockSpec((1, LANES), lambda i: (_z(i), i), memory_space=pltpu.VMEM)
    rhs_spec = None
    if k_rhs is not None:
        rhs_spec = pl.BlockSpec(
            (k_rhs, m, LANES), lambda i: (_z(i), _z(i), i), memory_space=pltpu.VMEM
        )
    return l_spec, dinv_spec, reg_spec, rhs_spec


@functools.partial(jax.jit, static_argnames=("m",))
def _fused_factor_bl(W, dT, reg, *, m: int):
    """(m², n), (n, B), (B,) → (L, dinv): matmul fused into the kernel."""
    n, B = dT.shape
    dtype = dT.dtype
    l_spec, dinv_spec, reg_spec, _ = _lp_specs(m)
    return pl.pallas_call(
        functools.partial(_fused_factor_kernel, m=m),
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((m * m, n), lambda i: (_z(i), _z(i)), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda i: (_z(i), i), memory_space=pltpu.VMEM),
            reg_spec,
        ],
        out_specs=[l_spec, dinv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, m, B), dtype),
            jax.ShapeDtypeStruct((m, B), dtype),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * m * n * B + (m**3) * B // 3,
            bytes_accessed=(m * m * n + n * B + 2 * m * m * B) * dtype.itemsize,
            transcendentals=m * B,
        ),
    )(W, dT, reg[None, :])


@functools.partial(jax.jit, static_argnames=("m",))
def _chol_bl(M, reg, *, m: int):
    """M (m, m, B) → (L, dinv); M formed by XLA (W @ dᵀ reshape ~free)."""
    B = M.shape[-1]
    dtype = M.dtype
    l_spec, dinv_spec, reg_spec, _ = _lp_specs(m)
    return pl.pallas_call(
        functools.partial(_chol_kernel, m=m),
        grid=(B // LANES,),
        in_specs=[l_spec, reg_spec],
        out_specs=[l_spec, dinv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, m, B), dtype),
            jax.ShapeDtypeStruct((m, B), dtype),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=(m**3) * B // 3,
            bytes_accessed=2 * m * m * B * dtype.itemsize,
            transcendentals=m * B,
        ),
    )(M, reg[None, :])


@functools.partial(jax.jit, static_argnames=("m", "k_rhs"))
def _facsol_bl(M, reg, R, *, m: int, k_rhs: int):
    """M (m,m,B), reg (B,), R (k,m,B) → (L, dinv, V) in ONE launch."""
    B = M.shape[-1]
    dtype = M.dtype
    l_spec, dinv_spec, reg_spec, rhs_spec = _lp_specs(m, k_rhs)
    return pl.pallas_call(
        functools.partial(_facsol_kernel, m=m, k_rhs=k_rhs),
        grid=(B // LANES,),
        in_specs=[l_spec, reg_spec, rhs_spec],
        out_specs=[l_spec, dinv_spec, rhs_spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, m, B), dtype),
            jax.ShapeDtypeStruct((m, B), dtype),
            jax.ShapeDtypeStruct((k_rhs, m, B), dtype),
        ],
        input_output_aliases={0: 0},
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=(m**3) * B // 3 + 2 * k_rhs * m * m * B,
            bytes_accessed=(2 * m * m * B + 2 * k_rhs * m * B) * dtype.itemsize,
            transcendentals=m * B,
        ),
    )(M, reg[None, :], R)


@functools.partial(jax.jit, static_argnames=("m", "k_rhs"))
def _solve_bl(L, DINV, R, *, m: int, k_rhs: int):
    """L (m, m, B), dinv (m, B), R (k, m, B) → V (k, m, B)."""
    B = L.shape[-1]
    dtype = L.dtype
    l_spec, dinv_spec, _, rhs_spec = _lp_specs(m, k_rhs)
    return pl.pallas_call(
        functools.partial(_solve_kernel, m=m, k_rhs=k_rhs),
        grid=(B // LANES,),
        in_specs=[l_spec, dinv_spec, rhs_spec],
        out_specs=rhs_spec,
        out_shape=jax.ShapeDtypeStruct((k_rhs, m, B), dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * k_rhs * m * m * B,
            bytes_accessed=(m * m * B + 2 * k_rhs * m * B) * dtype.itemsize,
            transcendentals=0,
        ),
    )(L, DINV, R)


def _pad_lanes(arr, B):
    """Pad the trailing (lane) axis up to a LANES multiple."""
    Bp = -(-B // LANES) * LANES
    if Bp == B:
        return arr, B
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, Bp - B)]
    return jnp.pad(arr, pad, constant_values=1.0), Bp


# ---------------------------------------------------------------------------
# KernelSet implementation
# ---------------------------------------------------------------------------


class PreparedBL(typing.NamedTuple):
    """Prepared shared-A context + the (m², n) self-outer-product W."""

    A: typing.Any
    Asq: typing.Any
    W: typing.Any


class BLFactor(typing.NamedTuple):
    """Batch-last factorization: L, dinv are lane-padded (m, m, Bp)/(m, Bp)."""

    ctx: typing.Any
    L: typing.Any
    dinv_diag: typing.Any  # reciprocal diagonal of L, (m, Bp)
    d: typing.Any
    reg: typing.Any


class BatchLastKernels(KernelSet):
    """Pallas batch-last kernel set (requires shared 2-D A in f32/bf16).

    Falls back to the XLA reference implementation for per-instance
    (3-D) A and for f64 (Mosaic has no f64 path; the mixed-precision
    finish phase uses XLA's emulated f64 on TPU).

    ``fuse_form=True`` computes M = W @ dᵀ on the MXU inside the factor
    kernel (M never touches HBM); the default forms M with an XLA
    matmul and feeds the Cholesky-only kernel.
    """

    name = "pallas_batchlast"

    def __init__(self, fuse_form: bool = False, fuse_facsol: bool = False):
        self.fuse_form = fuse_form
        self.fuse_facsol = fuse_facsol
        if fuse_form or fuse_facsol:
            self.name = f"pallas_batchlast{'_form' if fuse_form else ''}{'_facsol' if fuse_facsol else ''}"

    def prepare(self, A):
        if A.ndim != 2:
            return REFERENCE_KERNELS.prepare(A)
        m, n = A.shape
        W = (A[:, None, :] * A[None, :, :]).reshape(m * m, n)
        return PreparedBL(A=A, Asq=A * A, W=W)

    def mv(self, ctx, x):
        return jnp.einsum("...mn,...n->...m", ctx.A, x)

    def rmv(self, ctx, y):
        return jnp.einsum("...mn,...m->...n", ctx.A, y)

    def factor(self, ctx, d, reg_eps):
        # route on the RESULT dtype: an f64 A with f32 d still promotes
        # M to f64, which Mosaic cannot lower ("64-bit types are not
        # supported" — exactly how tests_tpu/smoke.py's batchlast
        # section died in round 3 when its input construction silently
        # promoted A to f64 under jax_enable_x64)
        if jnp.float64 in (d.dtype, ctx.A.dtype):
            base = ctx if isinstance(ctx, PreparedA) else PreparedA(ctx.A, ctx.Asq)
            return REFERENCE_KERNELS.factor(base, d, reg_eps)
        if not isinstance(ctx, PreparedBL):
            # batched (per-instance) A: no shared-W trick, but the lane-
            # vectorised Cholesky still beats XLA's batched cholesky by
            # ~60x — form M per instance, with the einsum emitting the
            # batch-LAST layout directly so XLA can fuse the layout
            # change into the contraction epilogue instead of a separate
            # full-batch HBM transpose every iteration (VERDICT r1 #10).
            m = ctx.A.shape[-2]
            B = d.shape[0]
            diag = jnp.einsum("...mn,...n->...m", ctx.Asq, d)
            reg = (reg_eps * jnp.max(diag, axis=-1)).astype(d.dtype)
            M_bl, _ = _pad_lanes(jnp.einsum("bmn,bn,bkn->mkb", ctx.A, d, ctx.A), B)
            regp, _ = _pad_lanes(reg, B)
            L, dinv = _chol_bl(M_bl, regp, m=m)
            return BLFactor(ctx=ctx, L=L, dinv_diag=dinv, d=d, reg=reg)
        m = ctx.A.shape[0]
        B = d.shape[0]
        diag = jnp.einsum("mn,bn->bm", ctx.Asq, d)
        reg = (reg_eps * jnp.max(diag, axis=-1)).astype(d.dtype)
        dT, Bp = _pad_lanes(d.T, B)
        regp, _ = _pad_lanes(reg, B)
        if self.fuse_form:
            L, dinv = _fused_factor_bl(ctx.W, dT, regp, m=m)
        else:
            M = (ctx.W @ dT).reshape(m, m, Bp)
            L, dinv = _chol_bl(M, regp, m=m)
        return BLFactor(ctx=ctx, L=L, dinv_diag=dinv, d=d, reg=reg)

    def finish_kernels(self, which: str = "df64") -> KernelSet:
        """Wide-phase sibling selected by ``SolverOptions.finish_kset``.

        Default "df64": df64 Pallas factors + Ozaki bf16 MXU formation +
        f64 residuals — a straight f64 finish would fall back to XLA's
        emulated f64 (matmul ~65x slower than f32 on v5e).  The
        f32-factor + iterative-refinement set ("mixed", ops/mixed.py)
        cannot reach the 1e-6 contract for the late-IPM system (its f32
        PSD-safety shift makes IR stagnate at ~3e-4 — measured,
        exp_finish_debug2) but IS the shipping engine for the crossover
        basis solves, whose 0/1-diagonal systems stay well-conditioned
        (``SolverOptions.crossover_kset``).  See
        :mod:`pycllp_tpu.ops.df64` / :mod:`pycllp_tpu.ops.mixed`.
        """
        cache = getattr(self, "_finish_kernels", None)
        if cache is None:
            cache = self._finish_kernels = {}
        fk = cache.get(which)
        if fk is None:
            if which == "df64":
                from pycllp_tpu.ops.df64 import DF64_FINISH_KERNELS as fk
            elif which == "df64_f64form":
                from pycllp_tpu.ops.df64 import DF64_F64FORM_KERNELS as fk
            elif which == "df64_fastform":
                from pycllp_tpu.ops.df64 import DF64_FASTFORM_KERNELS as fk
            elif which == "mixed":
                from pycllp_tpu.ops.mixed import MIXED_FINISH_KERNELS as fk
            elif which == "mixed1":
                from pycllp_tpu.ops.mixed import MIXED_IR1_KERNELS as fk
            elif which == "reference":
                fk = REFERENCE_KERNELS
            else:
                raise ValueError(f"unknown finish kernel set {which!r}")
            cache[which] = fk
        return fk

    def factor_and_solve(self, ctx, d, reg_eps, rs):
        """Fused path: factorization + first solve batch in one launch.

        Opt-in (``fuse_facsol=True``): measured slower than the split
        kernels on the v5e remote setup despite fewer launches — the
        aliased double-buffering serialises the pipeline.
        """
        if (
            not self.fuse_facsol
            or not isinstance(ctx, PreparedBL)
            or d.dtype == jnp.float64
        ):
            fac = self.factor(ctx, d, reg_eps)
            return fac, self.solve(fac, rs)
        m = ctx.A.shape[0]
        B = d.shape[0]
        diag = jnp.einsum("mn,bn->bm", ctx.Asq, d)
        reg = (reg_eps * jnp.max(diag, axis=-1)).astype(d.dtype)
        dT, Bp = _pad_lanes(d.T, B)
        regp, _ = _pad_lanes(reg, B)
        M = (ctx.W @ dT).reshape(m, m, Bp)
        R = jnp.stack([r.T for r in rs], axis=0)
        Rp, _ = _pad_lanes(R, B)
        L, dinv, V = _facsol_bl(M, regp, Rp, m=m, k_rhs=len(rs))
        fac = BLFactor(ctx=ctx, L=L, dinv_diag=dinv, d=d, reg=reg)
        return fac, tuple(V[i, :, :B].T for i in range(len(rs)))

    def solve(self, fac, rs):
        if not isinstance(fac, BLFactor):
            return REFERENCE_KERNELS.solve(fac, rs)
        m = fac.L.shape[0]
        B = rs[0].shape[0]
        R = jnp.stack([r.T for r in rs], axis=0)  # (k, m, B)
        Rp, _ = _pad_lanes(R, B)
        V = _solve_bl(fac.L, fac.dinv_diag, Rp, m=m, k_rhs=len(rs))
        return tuple(V[i, :, :B].T for i in range(len(rs)))


BATCHLAST_KERNELS = BatchLastKernels()
BATCHLAST_FUSED_KERNELS = BatchLastKernels(fuse_form=True)

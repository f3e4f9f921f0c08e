"""Kernel-set equivalence tests (the upstream cross-backend QA pattern):
Pallas batch-last kernels (interpret mode on CPU) vs the XLA reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pycllp_tpu.ops.reference import REFERENCE_KERNELS
from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS, BLFactor, PreparedBL


def _random_spd_problem(m, n, B, seed, dtype=np.float32):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(m, n)), dtype)
    d = jnp.asarray(rng.uniform(0.5, 2.0, size=(B, n)), dtype)
    rs = tuple(jnp.asarray(rng.normal(size=(B, m)), dtype) for _ in range(2))
    return A, d, rs


class TestBatchLastKernels:
    @pytest.mark.parametrize("m,n,B", [(8, 20, 4), (64, 128, 128), (13, 30, 150)])
    def test_factor_solve_matches_reference(self, m, n, B):
        A, d, rs = _random_spd_problem(m, n, B, seed=m + B)
        ctx_ref = REFERENCE_KERNELS.prepare(A)
        fac_ref = REFERENCE_KERNELS.factor(ctx_ref, d, 1e-7)
        v_ref = REFERENCE_KERNELS.solve(fac_ref, rs)

        ctx_bl = BATCHLAST_KERNELS.prepare(A)
        assert isinstance(ctx_bl, PreparedBL)
        fac_bl = BATCHLAST_KERNELS.factor(ctx_bl, d, 1e-7)
        assert isinstance(fac_bl, BLFactor)
        v_bl = BATCHLAST_KERNELS.solve(fac_bl, rs)

        for a, b in zip(v_ref, v_bl):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_factor_matches_dense_cholesky(self):
        m, n, B = 16, 40, 8
        A, d, _ = _random_spd_problem(m, n, B, seed=0, dtype=np.float64)
        # f64 route falls back to reference — force f32 for the kernel,
        # compare against f64 ground truth loosely
        A32, d32 = A.astype(jnp.float32), d.astype(jnp.float32)
        ctx = BATCHLAST_KERNELS.prepare(A32)
        fac = BATCHLAST_KERNELS.factor(ctx, d32, 0.0)
        L = np.asarray(fac.L)  # (m, m, Bp)
        An, dn = np.asarray(A), np.asarray(d)
        for bidx in range(B):
            M = (An * dn[bidx]) @ An.T
            L_ref = np.linalg.cholesky(M)
            np.testing.assert_allclose(
                np.tril(L[:, :, bidx]), L_ref, rtol=5e-4, atol=5e-4
            )

    def test_f64_falls_back_to_reference(self):
        m, n, B = 8, 20, 4
        A, d, rs = _random_spd_problem(m, n, B, seed=3, dtype=np.float64)
        ctx = BATCHLAST_KERNELS.prepare(A)
        fac = BATCHLAST_KERNELS.factor(ctx, d, 1e-12)
        assert not isinstance(fac, BLFactor)  # reference NormalFactor
        v = BATCHLAST_KERNELS.solve(fac, rs)
        v_ref = REFERENCE_KERNELS.solve(fac, rs)
        for a, b in zip(v, v_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_batched_A_falls_back(self):
        rng = np.random.default_rng(5)
        A3 = jnp.asarray(rng.normal(size=(4, 8, 20)), jnp.float32)
        ctx = BATCHLAST_KERNELS.prepare(A3)
        assert not isinstance(ctx, PreparedBL)

    def test_matvec_M_identity(self):
        """matvec_M must reproduce M @ v including the δ shift."""
        m, n, B = 10, 25, 6
        A, d, rs = _random_spd_problem(m, n, B, seed=7)
        ctx = BATCHLAST_KERNELS.prepare(A)
        fac = BATCHLAST_KERNELS.factor(ctx, d, 1e-5)
        v = rs[0]
        mv = np.asarray(BATCHLAST_KERNELS.matvec_M(fac, v))
        An, dn, vn = np.asarray(A, np.float64), np.asarray(d, np.float64), np.asarray(v, np.float64)
        reg = np.asarray(fac.reg, np.float64)
        for i in range(B):
            M = (An * dn[i]) @ An.T + reg[i] * np.eye(m)
            np.testing.assert_allclose(mv[i], M @ vn[i], rtol=1e-4, atol=1e-4)

    def test_nonpsd_lane_produces_nan(self):
        """A lane whose normal matrix is not PSD must NaN (caught by the
        solver's numerical guard), not silently corrupt others."""
        m, n, B = 6, 15, 4
        A, d, rs = _random_spd_problem(m, n, B, seed=9)
        d = d.at[2].set(-d[2])  # negative scaling → indefinite M on lane 2
        ctx = BATCHLAST_KERNELS.prepare(A)
        fac = BATCHLAST_KERNELS.factor(ctx, d, 0.0)
        v = BATCHLAST_KERNELS.solve(fac, rs)[0]
        v = np.asarray(v)
        assert np.isnan(v[2]).any()
        assert np.isfinite(v[[0, 1, 3]]).all()


class TestSolverWithPallasKernels:
    def test_hsd_with_batchlast_matches_reference(self):
        from pycllp_tpu import SolverOptions, Status
        from pycllp_tpu.io.generate import random_equality_lp
        from pycllp_tpu.solvers.hsd import hsd_solve_batched

        m, n, B = 12, 30, 16
        A, _, _ = random_equality_lp(m, n, seed=21)
        rng = np.random.default_rng(22)
        x0 = rng.uniform(0.1, 1.0, size=(B, n))
        y0 = rng.normal(size=(B, m))
        z0 = rng.uniform(0.1, 1.0, size=(B, n))
        b = x0 @ A.T
        c = y0 @ A + z0
        opts = SolverOptions(tol=1e-6, dtype="float32")
        Af, bf, cf = (v.astype(np.float32) for v in (A, b, c))
        ref = hsd_solve_batched(Af, bf, cf, opts, REFERENCE_KERNELS)
        out = hsd_solve_batched(Af, bf, cf, opts, BATCHLAST_KERNELS)
        np.testing.assert_allclose(
            np.asarray(out["objective"]), np.asarray(ref["objective"]), rtol=5e-4, atol=5e-4
        )
        ok = np.isin(np.asarray(out["status"]), [int(Status.OPTIMAL), int(Status.STALLED)])
        assert ok.all()

    def test_hsd_batchlast_mixed_precision(self):
        """f32 Pallas bulk + f64 XLA finish matches scipy to 1e-6."""
        from scipy.optimize import linprog

        from pycllp_tpu import SolverOptions, Status
        from pycllp_tpu.io.generate import random_equality_lp
        from pycllp_tpu.solvers.hsd import hsd_solve_batched

        m, n = 16, 40
        A, b, c = random_equality_lp(m, n, seed=31)
        # f64 inputs: phase 1 rounds to f32 internally, the polish phase
        # sees the true data (f32 inputs would pin the answer to the
        # f32-rounded problem — information already lost at the API).
        opts = SolverOptions(tol=1e-7, dtype="float32", finish_dtype="float64")
        out = hsd_solve_batched(A, b[None], c[None], opts, BATCHLAST_KERNELS)
        res = linprog(c, A_eq=A, b_eq=b, bounds=[(0, None)] * n, method="highs")
        assert int(out["status"][0]) == int(Status.OPTIMAL)
        np.testing.assert_allclose(float(out["objective"][0]), res.fun, rtol=1e-6, atol=1e-6)


class TestBatchedAPallas:
    def test_batched_A_uses_pallas_f32(self):
        """3-D A in f32 routes through the batch-last kernels (not the
        slow XLA fallback) and matches the reference solve."""
        from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS, BLFactor
        from pycllp_tpu.ops.reference import REFERENCE_KERNELS

        rng = np.random.default_rng(44)
        B, m, n = 6, 10, 24
        A3 = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float32)
        d = jnp.asarray(rng.uniform(0.5, 2.0, size=(B, n)), jnp.float32)
        rs = (jnp.asarray(rng.normal(size=(B, m)), jnp.float32),)
        ctx = BATCHLAST_KERNELS.prepare(A3)
        fac = BATCHLAST_KERNELS.factor(ctx, d, 1e-7)
        assert isinstance(fac, BLFactor)
        v = BATCHLAST_KERNELS.solve(fac, rs)[0]
        ctx_r = REFERENCE_KERNELS.prepare(A3)
        fac_r = REFERENCE_KERNELS.factor(ctx_r, d, 1e-7)
        v_r = REFERENCE_KERNELS.solve(fac_r, rs)[0]
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_r), rtol=2e-4, atol=2e-5)

    def test_batched_A_full_solve(self):
        from pycllp_tpu import SolverOptions, Status
        from pycllp_tpu.io.generate import random_equality_lp
        from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS
        from pycllp_tpu.solvers.hsd import hsd_solve_batched
        from scipy.optimize import linprog

        A, b, c = random_equality_lp(8, 20, nlp=5, seed=23, shared_A=False)
        out = hsd_solve_batched(
            A.astype(np.float32), b.astype(np.float32), c.astype(np.float32),
            SolverOptions(tol=1e-5, dtype="float32"), BATCHLAST_KERNELS,
        )
        for i in range(5):
            res = linprog(c[i], A_eq=A[i], b_eq=b[i], bounds=[(0, None)] * 20, method="highs")
            rel = abs(float(out["objective"][i]) - res.fun) / max(1, abs(res.fun))
            assert rel < 1e-3

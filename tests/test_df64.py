"""Double-single (df64) kernel set: precision and finish-phase contract.

The df64 kernels must deliver far-better-than-f32 factorizations
(~1e-12 solve accuracy on moderately conditioned systems) so the wide
finish phase can meet the 1e-6 objective contract that the f32-factor
iterative-refinement design could not (see ops/df64.py header).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pycllp_tpu.ops.df64 import (
    DF64_FINISH_KERNELS,
    _split_hi_lo,
    df_add,
    df_div,
    df_mul,
    df_sqrt,
)


def _rand_spd_problem(m, n, B, seed, cond_boost=1.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    d = np.abs(rng.standard_normal((B, n))) + 1e-3
    d[:, : n // 4] *= cond_boost  # widen the spectrum like a late IPM D
    return A, d


class TestDFArithmetic:
    def test_add_mul_precision(self):
        rng = np.random.default_rng(0)
        a64 = rng.standard_normal(1024)
        b64 = rng.standard_normal(1024)
        a = _split_hi_lo(jnp.asarray(a64))
        b = _split_hi_lo(jnp.asarray(b64))
        s = df_add(a, b)
        p = df_mul(a, b)
        s_err = np.abs(np.asarray(s[0], np.float64) + np.asarray(s[1], np.float64) - (a64 + b64))
        p_err = np.abs(np.asarray(p[0], np.float64) + np.asarray(p[1], np.float64) - (a64 * b64))
        assert s_err.max() < 1e-13
        assert p_err.max() < 1e-13

    def test_div_sqrt_precision(self):
        rng = np.random.default_rng(1)
        a64 = np.abs(rng.standard_normal(1024)) + 0.1
        b64 = np.abs(rng.standard_normal(1024)) + 0.1
        a = _split_hi_lo(jnp.asarray(a64))
        b = _split_hi_lo(jnp.asarray(b64))
        q = df_div(a, b)
        r = df_sqrt(a)
        q_rel = np.abs(
            (np.asarray(q[0], np.float64) + np.asarray(q[1], np.float64)) - a64 / b64
        ) / np.abs(a64 / b64)
        r_rel = np.abs(
            (np.asarray(r[0], np.float64) + np.asarray(r[1], np.float64)) - np.sqrt(a64)
        ) / np.sqrt(a64)
        assert q_rel.max() < 1e-13
        assert r_rel.max() < 1e-13


class TestOzakiFormation:
    @pytest.mark.parametrize("n,B", [(48, 256), (200, 128)])
    def test_exact_gemm_wide_dynamic_range(self, n, B):
        """Grouped integer-slice GEMM ≈ f64 GEMM to ≲1e-13 of the output
        scale on 16-decade-spread d (the late-IPM regime that broke the
        plain f32 split-GEMM formation)."""
        from pycllp_tpu.ops.df64 import _ozaki_matmul, _ozaki_prepare, ozaki_params

        rng = np.random.default_rng(0)
        m = 24
        A = rng.standard_normal((m, n))
        W = (A[:, None, :] * A[None, :, :]).reshape(m * m, n)
        d = np.exp(rng.uniform(-18, 18, (n, B)))
        s, n_slices, cut = ozaki_params(n)
        Wg, We = _ozaki_prepare(jnp.asarray(W), s=s, n_slices=n_slices, cut=cut)
        P = np.asarray(
            _ozaki_matmul(Wg, We, jnp.asarray(d), s=s, n_slices=n_slices, cut=cut)
        )
        ref = W @ d
        scale = np.abs(W) @ d
        err = (np.abs(P - ref) / np.maximum(scale, 1e-300)).max()
        assert err < 1e-12, f"abs-scaled err {err:.2e}"

    def test_slices_are_integer_bf16_exact(self):
        """Every slice entry is an integer ≤ 2^s — the property that makes
        the bf16 cast and the grouped f32 MXU accumulation exact."""
        from pycllp_tpu.ops.df64 import _df_slice_int, ozaki_params

        rng = np.random.default_rng(1)
        X = rng.standard_normal((100, 32)) * np.exp(rng.uniform(-9, 9, (100, 32)))
        # one row far beyond f32 range: the f64-first normalization must
        # keep it sliceable (the round-3 late-IPM NaN root cause)
        X[0] *= 1e45
        s, n_slices, _ = ozaki_params(32)
        slices, e = _df_slice_int(jnp.asarray(X), axis=1, s=s, n_slices=n_slices)
        recon = np.zeros_like(X)
        for k, sl in enumerate(slices, start=1):
            sl64 = np.asarray(sl, np.float64)
            assert np.array_equal(sl64, np.round(sl64)), "non-integer slice"
            assert np.abs(sl64).max() <= 2.0**s
            cast = np.asarray(jnp.asarray(sl).astype(jnp.bfloat16), np.float64)
            assert np.array_equal(sl64, cast), "bf16 cast not exact"
            recon += sl64 * 2.0 ** (-s * k)
        recon *= np.asarray(e, np.float64)
        # slicing must capture X to ~2^(-s·n_slices) of the per-row max
        # (the f32 pair split inside contributes ~2^-49, above the
        # truncation floor but far below the factorization's needs)
        mx = np.abs(X).max(axis=1, keepdims=True)
        assert (np.abs(recon - X) / mx).max() < 2.0**-48

    def test_ozaki_params_accumulation_bound(self):
        """For every supported contraction length the chosen (s, slices)
        keep the worst-case grouped f32 accumulation below 2^24."""
        from pycllp_tpu.ops.df64 import ozaki_params

        for n in (32, 128, 146, 200, 455, 1024, 2048, 4096):
            s, n_slices, cut = ozaki_params(n)
            assert n * n_slices * 4**s <= 2**24
            assert s * n_slices >= 56
            assert cut == n_slices + 1


class TestDFFactorSolve:
    @pytest.mark.parametrize("m,n,B", [(16, 24, 128), (32, 48, 256)])
    def test_solve_accuracy_vs_numpy(self, m, n, B):
        A, d = _rand_spd_problem(m, n, B, seed=2)
        kset = DF64_FINISH_KERNELS
        ctx = kset.prepare(jnp.asarray(A))
        fac = kset.factor(ctx, jnp.asarray(d), 1e-14)
        rng = np.random.default_rng(3)
        r = rng.standard_normal((B, m))
        (v,) = kset.solve(fac, (jnp.asarray(r),))
        v = np.asarray(v, np.float64)
        for i in range(0, B, 37):
            M = (A * d[i]) @ A.T + float(np.asarray(fac.reg)[i]) * np.eye(m)
            v_ref = np.linalg.solve(M, r[i])
            rel = np.linalg.norm(v[i] - v_ref) / np.linalg.norm(v_ref)
            assert rel < 1e-11, f"lane {i}: rel {rel:.2e}"

    def test_beats_f32_on_ill_conditioned(self):
        """The raison d'être: late-IPM conditioning where f32+IR stalls."""
        m, n, B = 24, 36, 128
        A, d = _rand_spd_problem(m, n, B, seed=4, cond_boost=3e5)
        kset = DF64_FINISH_KERNELS
        ctx = kset.prepare(jnp.asarray(A))
        fac = kset.factor(ctx, jnp.asarray(d), 1e-14)
        rng = np.random.default_rng(5)
        r = rng.standard_normal((B, m))
        (v,) = kset.solve(fac, (jnp.asarray(r),))
        v = np.asarray(v, np.float64)
        worst = 0.0
        for i in range(0, B, 31):
            M = (A * d[i]) @ A.T + float(np.asarray(fac.reg)[i]) * np.eye(m)
            v_ref = np.linalg.solve(M, r[i])
            worst = max(worst, np.linalg.norm(v[i] - v_ref) / np.linalg.norm(v_ref))
        # f32 delivers ~cond·6e-8 ≈ 1e-2 here; df64 must be orders better
        assert worst < 1e-8, f"worst rel {worst:.2e}"

    def test_batched_A_path(self):
        m, n, B = 12, 20, 128
        rng = np.random.default_rng(6)
        A3 = rng.standard_normal((B, m, n))
        d = np.abs(rng.standard_normal((B, n))) + 1e-2
        kset = DF64_FINISH_KERNELS
        ctx = kset.prepare(jnp.asarray(A3))
        fac = kset.factor(ctx, jnp.asarray(d), 1e-14)
        r = rng.standard_normal((B, m))
        (v,) = kset.solve(fac, (jnp.asarray(r),))
        v = np.asarray(v, np.float64)
        for i in range(0, B, 41):
            M = (A3[i] * d[i]) @ A3[i].T + float(np.asarray(fac.reg)[i]) * np.eye(m)
            v_ref = np.linalg.solve(M, r[i])
            assert np.linalg.norm(v[i] - v_ref) / np.linalg.norm(v_ref) < 1e-10


class TestFinishContract:
    @pytest.mark.slow
    def test_scan_compact_finish_meets_tol(self):
        """f32 bulk + df64 finish reaches 1e-6 vs scipy on random LPs."""
        from scipy.optimize import linprog

        from pycllp_tpu import SolverOptions
        from pycllp_tpu.io.generate import random_standard_lp
        from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS
        from pycllp_tpu.solvers.hsd import hsd_solve_scan

        total = 64
        m = n = 16
        lp = random_standard_lp(m, n, nlp=total, seed=7, dtype=np.float32)
        eq = lp.to_equality_form()
        opts = SolverOptions(
            tol=1e-7, maxiter=40, dtype="float32", init_point="mehrotra",
            finish_dtype="float64", switch_tol=1e-4, finish_maxiter=25,
        )
        out = hsd_solve_scan(
            np.asarray(eq.A, np.float32), np.asarray(eq.b, np.float32),
            np.asarray(eq.c, np.float32), opts, BATCHLAST_KERNELS,
            chunk=32, keys=("objective", "status"),
            compact_cap=10, compact_bucket=32, finish_cap=8,
        )
        obj = np.asarray(out["objective"])
        rels = []
        for i in range(0, total, 7):
            res = linprog(
                -np.asarray(lp.c)[i].astype(np.float64),
                A_ub=np.asarray(lp.A, np.float64),
                b_ub=np.asarray(lp.b)[i].astype(np.float64),
                bounds=[(0, None)] * n, method="highs",
            )
            if res.status == 0:
                rels.append(abs(-float(obj[i]) + res.fun) / max(1.0, abs(res.fun)))
        assert max(rels) < 1e-6, f"max rel {max(rels):.2e}"

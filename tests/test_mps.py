"""MPS reader/writer + netlib-fixture tests (upstream ``iolp.c`` parity)."""

import numpy as np
import pytest
from scipy.optimize import linprog

from pycllp_tpu import SolverOptions, Status, get_solver
from pycllp_tpu.io.mps import read_mps, write_mps
from pycllp_tpu.io.netlib import fixture_names, load_fixture, pad_and_mask
from pycllp_tpu.models import GeneralLP

SAMPLE = """\
* classic tiny example
NAME          TESTPROB
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    X1  COST  1.0  LIM1  1.0
    X1  LIM2  1.0
    X2  COST  2.0  LIM1  1.0
    X2  MYEQN  -1.0
    X3  COST  -1.0  MYEQN  1.0
RHS
    RHS  LIM1  4.0  LIM2  1.0
    RHS  MYEQN  7.0
BOUNDS
 UP BND  X1  4.0
 LO BND  X2  -1.0
ENDATA
"""


class TestReader:
    def test_parse_sample(self):
        prob = read_mps(SAMPLE)
        assert prob.name == "TESTPROB"
        assert prob.row_names == ["LIM1", "LIM2", "MYEQN"]
        assert prob.col_names == ["X1", "X2", "X3"]
        lp = prob.lp
        np.testing.assert_allclose(lp.c, [1.0, 2.0, -1.0])
        np.testing.assert_allclose(lp.row_ub, [4.0, np.inf, 7.0])
        np.testing.assert_allclose(lp.row_lb, [-np.inf, 1.0, 7.0])
        np.testing.assert_allclose(lp.lb, [0.0, -1.0, 0.0])
        np.testing.assert_allclose(lp.ub, [4.0, np.inf, np.inf])
        A = np.zeros((3, 3))
        A[0, 0] = A[0, 1] = A[1, 0] = 1.0
        A[2, 1] = -1.0
        A[2, 2] = 1.0
        np.testing.assert_allclose(lp.A, A)

    def test_solves_like_scipy(self):
        prob = read_mps(SAMPLE)
        lp = prob.lp
        std, fmap = lp.to_standard_form()
        s = get_solver("hsd", tol=1e-9)
        s.init(std)
        sol = s.solve()
        res = linprog(
            lp.c,
            A_ub=np.array([lp.A[0]]),
            b_ub=np.array([4.0]),
            A_eq=np.array([lp.A[2]]),
            b_eq=np.array([7.0]),
            bounds=[(0, 4), (-1, None), (0, None)],
            method="highs",
        )
        # add the G row as ub
        res = linprog(
            lp.c,
            A_ub=np.array([lp.A[0], -lp.A[1]]),
            b_ub=np.array([4.0, -1.0]),
            A_eq=np.array([lp.A[2]]),
            b_eq=np.array([7.0]),
            bounds=[(0, 4), (-1, None), (0, None)],
            method="highs",
        )
        assert res.status == 0
        assert int(np.asarray(sol.status)) == int(Status.OPTIMAL)
        np.testing.assert_allclose(
            fmap.recover_objective(float(sol.objective)), res.fun, rtol=1e-7
        )

    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        A = rng.normal(size=(4, 6)) * (rng.random((4, 6)) < 0.5)
        glp = GeneralLP(
            A=A,
            row_lb=[-np.inf, 1.0, 2.0, 2.0],
            row_ub=[3.0, np.inf, 2.0, 5.0],
            c=rng.normal(size=6),
            lb=[0, 0, -1, -np.inf, 0.5, 0.5],
            ub=[np.inf, 2, np.inf, np.inf, np.inf, 0.5],
            f=1.25,
            sense="min",
        )
        text = write_mps(glp)
        back = read_mps(text).lp
        np.testing.assert_allclose(back.A, glp.A, atol=1e-14)
        np.testing.assert_allclose(back.c, glp.c, atol=1e-14)
        np.testing.assert_allclose(back.row_lb, glp.row_lb)
        np.testing.assert_allclose(back.row_ub, glp.row_ub)
        np.testing.assert_allclose(back.lb, glp.lb)
        np.testing.assert_allclose(back.ub, glp.ub)
        assert back.f == glp.f
        assert back.sense == glp.sense

    def test_objsense_max(self):
        text = write_mps(
            GeneralLP(A=[[1.0]], row_ub=[2.0], c=[1.0], sense="max")
        )
        assert read_mps(text).lp.sense == "max"

    def test_integer_marker_tolerated(self):
        text = SAMPLE.replace(
            "COLUMNS\n",
            "COLUMNS\n    MARK  'MARKER'  'INTORG'\n",
        )
        prob = read_mps(text)  # LP relaxation, no crash
        assert prob.col_names


class TestNetlibFixtures:
    @pytest.mark.parametrize("name", fixture_names())
    def test_fixture_solvable(self, name):
        prob = load_fixture(name)
        std, fmap = prob.lp.to_standard_form()
        s = get_solver("hsd", tol=1e-8)
        s.init(std)
        sol = s.solve()
        assert int(np.asarray(sol.status)) == int(Status.OPTIMAL)
        res = linprog(
            -np.asarray(std.c),
            A_ub=np.asarray(std.A),
            b_ub=np.asarray(std.b),
            bounds=[(0, None)] * std.ncols,
            method="highs",
        )
        assert res.status == 0
        np.testing.assert_allclose(float(sol.objective), -res.fun, rtol=1e-6, atol=1e-6)

    def test_pad_and_mask_shapes(self):
        probs = [load_fixture(n) for n in fixture_names()]
        stds = [p.lp.to_standard_form()[0] for p in probs]
        A, b, c, rmask, cmask = pad_and_mask(stds)
        B = len(stds)
        assert A.shape[0] == B and b.shape[0] == B and c.shape[0] == B
        assert A.shape[1] == max(s.nrows for s in stds)
        assert A.shape[2] == max(s.ncols for s in stds)
        # masked-out entries are the padding scheme's values
        assert (b[~rmask] == 1.0).all()
        assert (c[~cmask] == -1.0).all()

    def test_padded_batch_solves_to_same_objectives(self):
        """The heterogeneous padded batch must reproduce each problem's
        individual objective (padding never binds)."""
        from pycllp_tpu.solvers.hsd import hsd_solve_batched

        probs = [load_fixture(n) for n in fixture_names()]
        stds = [p.lp.to_standard_form()[0] for p in probs]
        A, b, c, _, _ = pad_and_mask(stds, dtype=np.float64)
        eqs = [s.to_equality_form() for s in stds]
        # batched equality form of the padded problems
        m, n = A.shape[1], A.shape[2]
        eye = np.broadcast_to(np.eye(m), (len(stds), m, m))
        A_eq = np.concatenate([A, eye], axis=2)
        c_eq = np.concatenate([-c, np.zeros((len(stds), m))], axis=1)
        out = hsd_solve_batched(A_eq, b, c_eq, SolverOptions(tol=1e-8))
        assert np.all(np.asarray(out["status"]) == int(Status.OPTIMAL))
        for i, s in enumerate(stds):
            res = linprog(
                -np.asarray(s.c),
                A_ub=np.asarray(s.A),
                b_ub=np.asarray(s.b),
                bounds=[(0, None)] * s.ncols,
                method="highs",
            )
            np.testing.assert_allclose(
                -float(out["objective"][i]), -res.fun, rtol=1e-6, atol=1e-6
            )


FIXED_FORMAT = (
    "* fixed-format MPS: fields at the classic column positions\n"
    "NAME          FIXEDFMT\n"
    "ROWS\n"
    " N  COST\n"
    " L  LIM1\n"
    " G  LIM2\n"
    " E  MYEQN\n"
    "COLUMNS\n"
    "    X1        COST         1.0   LIM1         1.0\n"
    "    X1        LIM2         1.0\n"
    "    X2        COST         2.0   LIM1         1.0\n"
    "    X2        MYEQN       -1.0\n"
    "    X3        COST        -1.0   MYEQN        1.0\n"
    "RHS\n"
    "    RHS       LIM1         4.0   LIM2         1.0\n"
    "    RHS       MYEQN        7.0\n"
    "BOUNDS\n"
    " UP BND       X1           4.0\n"
    " LO BND       X2          -1.0\n"
    "ENDATA\n"
)


class TestReaderHardening:
    """Edge-case fixtures covering each branch of the RHS/RANGES/BOUNDS
    parsers (VERDICT r1 item 7); all literal strings, no network."""

    def test_fixed_format_alignment(self):
        """Classic fixed-column MPS parses identically to free format."""
        fixed = read_mps(FIXED_FORMAT).lp
        free = read_mps(SAMPLE).lp
        np.testing.assert_allclose(fixed.A, free.A)
        np.testing.assert_allclose(fixed.c, free.c)
        np.testing.assert_allclose(fixed.row_lb, free.row_lb)
        np.testing.assert_allclose(fixed.row_ub, free.row_ub)
        np.testing.assert_allclose(fixed.lb, free.lb)
        np.testing.assert_allclose(fixed.ub, free.ub)

    def test_rhs_on_objective_row_sets_constant(self):
        text = SAMPLE.replace("RHS\n", "RHS\n    RHS  COST  2.5\n")
        assert read_mps(text).lp.f == -2.5

    def test_rhs_without_set_name(self):
        text = SAMPLE.replace(
            "    RHS  LIM1  4.0  LIM2  1.0\n    RHS  MYEQN  7.0\n",
            "    LIM1  4.0  LIM2  1.0\n    MYEQN  7.0\n",
        )
        lp = read_mps(text).lp
        np.testing.assert_allclose(lp.row_ub, [4.0, np.inf, 7.0])
        np.testing.assert_allclose(lp.row_lb, [-np.inf, 1.0, 7.0])

    def test_ranges_on_L_G_and_E_rows(self):
        text = SAMPLE.replace(
            "BOUNDS\n",
            "RANGES\n"
            "    RNG  LIM1  2.0\n"
            "    RNG  LIM2  -3.0\n"
            "    RNG  MYEQN  1.5\n"
            "BOUNDS\n",
        )
        lp = read_mps(text).lp
        # L row: [h-|r|, h]; G row: [h, h+|r|]; E row r>=0: [h, h+r]
        np.testing.assert_allclose(lp.row_lb, [2.0, 1.0, 7.0])
        np.testing.assert_allclose(lp.row_ub, [4.0, 4.0, 8.5])

    def test_negative_range_on_E_row(self):
        text = SAMPLE.replace(
            "BOUNDS\n", "RANGES\n    RNG  MYEQN  -1.5\nBOUNDS\n"
        )
        lp = read_mps(text).lp
        # E row with r<0: [h+r, h]
        np.testing.assert_allclose(lp.row_lb[2], 5.5)
        np.testing.assert_allclose(lp.row_ub[2], 7.0)

    def test_bounds_fr_mi_pl_with_and_without_set_name(self):
        base = SAMPLE.replace(
            " UP BND  X1  4.0\n LO BND  X2  -1.0\n",
            " FR BND  X1\n MI  X2\n PL BND  X3\n",
        )
        lp = read_mps(base).lp
        np.testing.assert_allclose(lp.lb, [-np.inf, -np.inf, 0.0])
        np.testing.assert_allclose(lp.ub, [np.inf, np.inf, np.inf])

    def test_bounds_bv_and_fx(self):
        text = SAMPLE.replace(
            " UP BND  X1  4.0\n LO BND  X2  -1.0\n",
            " BV BND  X1\n FX BND  X2  1.25\n",
        )
        lp = read_mps(text).lp
        np.testing.assert_allclose(lp.lb[:2], [0.0, 1.25])
        np.testing.assert_allclose(lp.ub[:2], [1.0, 1.25])

    def test_negative_up_bound_quirk(self):
        """UP with a negative value and no LO frees the lower bound
        (classic MPS convention)."""
        text = SAMPLE.replace(" UP BND  X1  4.0\n", " UP BND  X1  -2.0\n")
        lp = read_mps(text).lp
        assert lp.ub[0] == -2.0
        assert lp.lb[0] == -np.inf

    def test_extra_N_rows_dropped(self):
        text = SAMPLE.replace(
            " L  LIM1\n", " L  LIM1\n N  FREEROW\n"
        ).replace(
            "    X1  LIM2  1.0\n", "    X1  LIM2  1.0  FREEROW  9.0\n"
        )
        prob = read_mps(text)
        assert "FREEROW" not in prob.row_names
        np.testing.assert_allclose(prob.lp.A, read_mps(SAMPLE).lp.A)

    def test_comment_and_blank_lines_everywhere(self):
        lines = SAMPLE.splitlines()
        noisy = []
        for ln in lines:
            noisy.append(ln)
            noisy.append("* interleaved comment")
            noisy.append("")
        lp = read_mps("\n".join(noisy) + "\n").lp
        np.testing.assert_allclose(lp.A, read_mps(SAMPLE).lp.A)

    def test_missing_objective_raises(self):
        text = SAMPLE.replace(" N  COST\n", "")
        with pytest.raises(ValueError, match="no objective"):
            read_mps(text)

    def test_duplicate_objective_entries_accumulate(self):
        text = SAMPLE.replace(
            "    X1  COST  1.0  LIM1  1.0\n",
            "    X1  COST  0.5  LIM1  1.0\n    X1  COST  0.5\n",
        )
        np.testing.assert_allclose(read_mps(text).lp.c[0], 1.0)


class TestWriterReaderFuzz:
    """Randomized writer->reader round-trips (VERDICT r1 item 7): random
    GeneralLPs with every bound/row pattern must survive serialisation
    semantically (free rows are dropped by the reader by convention, so
    comparison filters them)."""

    @pytest.mark.parametrize("seed", range(8))
    def test_roundtrip_fuzz(self, seed):
        rng = np.random.default_rng(seed)
        m, n = int(rng.integers(1, 8)), int(rng.integers(1, 10))
        A = rng.normal(size=(m, n)) * (rng.random((m, n)) < 0.6)
        # row bound patterns: L / G / E / range / free
        row_lb = np.full(m, -np.inf)
        row_ub = np.full(m, np.inf)
        for i in range(m):
            kind = rng.integers(0, 5)
            h = float(np.round(rng.normal(), 3))
            if kind == 0:
                row_ub[i] = h
            elif kind == 1:
                row_lb[i] = h
            elif kind == 2:
                row_lb[i] = row_ub[i] = h
            elif kind == 3:
                row_lb[i], row_ub[i] = h - abs(float(rng.normal())) - 0.1, h
            # kind 4: free row
        lb = np.zeros(n)
        ub = np.full(n, np.inf)
        for j in range(n):
            kind = rng.integers(0, 5)
            v = float(np.round(rng.normal(), 3))
            if kind == 0:
                ub[j] = abs(v) + 0.1
            elif kind == 1:
                lb[j] = v
            elif kind == 2:
                lb[j] = ub[j] = v
            elif kind == 3:
                lb[j] = -np.inf
            # kind 4: default [0, inf)
        glp = GeneralLP(
            A=A, row_lb=row_lb, row_ub=row_ub,
            c=np.round(rng.normal(size=n), 3), lb=lb, ub=ub,
            f=float(np.round(rng.normal(), 3)),
            sense="max" if seed % 2 else "min",
        )
        back = read_mps(write_mps(glp)).lp
        keep = ~(np.isinf(row_lb) & np.isinf(row_ub))  # reader drops free rows
        np.testing.assert_allclose(np.asarray(back.A), A[keep], atol=1e-14)
        np.testing.assert_allclose(np.asarray(back.row_lb), row_lb[keep])
        np.testing.assert_allclose(np.asarray(back.row_ub), row_ub[keep])
        np.testing.assert_allclose(np.asarray(back.c), glp.c, atol=1e-14)
        np.testing.assert_allclose(np.asarray(back.lb), lb)
        np.testing.assert_allclose(np.asarray(back.ub), ub)
        assert back.f == glp.f and back.sense == glp.sense

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

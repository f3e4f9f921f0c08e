"""Sharded-solve tests on the virtual 8-device CPU mesh (SURVEY.md §4.2)."""

import numpy as np
import pytest
from scipy.optimize import linprog

import jax

from pycllp_tpu import SolverOptions, Status
from pycllp_tpu.io.generate import random_equality_lp
from pycllp_tpu.parallel import scenario_mesh, sharded_hsd_solve
from pycllp_tpu.solvers.hsd import hsd_solve_batched


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return scenario_mesh(8)


class TestShardedSolve:
    @pytest.mark.parametrize("termination", ["collective", "local"])
    def test_matches_unsharded(self, mesh8, termination):
        m, n, B = 8, 20, 32
        A, _, _ = random_equality_lp(m, n, seed=17)
        rng = np.random.default_rng(18)
        x0 = rng.uniform(0.1, 1.0, size=(B, n))
        y0 = rng.normal(size=(B, m))
        z0 = rng.uniform(0.1, 1.0, size=(B, n))
        b = x0 @ A.T
        c = y0 @ A + z0
        opts = SolverOptions(tol=1e-8)
        ref = hsd_solve_batched(A, b, c, opts)
        out = sharded_hsd_solve(A, b, c, opts, mesh=mesh8, termination=termination)
        assert np.all(np.asarray(out["status"]) == int(Status.OPTIMAL))
        np.testing.assert_allclose(
            np.asarray(out["objective"]), np.asarray(ref["objective"]), rtol=1e-8, atol=1e-9
        )

    def test_matches_scipy(self, mesh8):
        m, n, B = 6, 15, 16
        A, _, _ = random_equality_lp(m, n, seed=4)
        rng = np.random.default_rng(5)
        b = rng.uniform(0.1, 1.0, size=(B, n)) @ A.T
        c = rng.normal(size=(B, m)) @ A + rng.uniform(0.1, 1.0, size=(B, n))
        out = sharded_hsd_solve(A, b, c, SolverOptions(tol=1e-8), mesh=mesh8)
        for i in range(0, B, 5):
            res = linprog(c[i], A_eq=A, b_eq=b[i], bounds=[(0, None)] * n, method="highs")
            np.testing.assert_allclose(
                float(np.asarray(out["objective"])[i]), res.fun, rtol=1e-6, atol=1e-6
            )

    def test_batched_A_shards(self, mesh8):
        m, n, B = 5, 12, 16
        A, b, c = random_equality_lp(m, n, nlp=B, seed=9, shared_A=False)
        out = sharded_hsd_solve(A, b, c, SolverOptions(tol=1e-8), mesh=mesh8)
        assert np.all(np.asarray(out["status"]) == int(Status.OPTIMAL))

    def test_single_device_mesh_degrades(self):
        mesh1 = scenario_mesh(1)
        m, n, B = 5, 12, 4
        A, b, c = random_equality_lp(m, n, nlp=B, seed=2, shared_A=False)
        out = sharded_hsd_solve(A, b, c, SolverOptions(tol=1e-8), mesh=mesh1)
        assert np.all(np.asarray(out["status"]) == int(Status.OPTIMAL))

    def test_indivisible_batch_raises(self, mesh8):
        A, b, c = random_equality_lp(5, 12, nlp=12, seed=2, shared_A=False)
        with pytest.raises(ValueError, match="divisible"):
            sharded_hsd_solve(A, b, c, SolverOptions(), mesh=mesh8)

    def test_mixed_statuses_across_shards(self, mesh8):
        """Infeasible + optimal lanes spread over devices: the collective
        gate must keep looping until the slowest shard finishes."""
        A = np.array([[1.0, 1.0]])
        B = 16
        rng = np.random.default_rng(0)
        bs = rng.uniform(0.5, 2.0, size=(B, 1))
        bs[::4] = -1.0  # every 4th lane infeasible
        cs = np.broadcast_to(np.array([1.0, 2.0]), (B, 2)).copy()
        out = sharded_hsd_solve(
            np.broadcast_to(A, (B, 1, 2)).copy(), bs, cs, SolverOptions(tol=1e-8), mesh=mesh8
        )
        st = np.asarray(out["status"])
        assert np.all(st[::4] == int(Status.INFEASIBLE))
        mask = np.ones(B, bool)
        mask[::4] = False
        assert np.all(st[mask] == int(Status.OPTIMAL))


class TestDistributedHelpers:
    def test_single_process_noop(self):
        from pycllp_tpu.parallel import initialize, is_distributed

        assert initialize() is False
        assert is_distributed() is False

    def test_global_mesh(self):
        from pycllp_tpu.parallel import global_scenario_mesh

        mesh = global_scenario_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("scenario",)

    def test_host_local_batch(self):
        from pycllp_tpu.parallel import host_local_batch

        lo, count = host_local_batch(100)
        assert (lo, count) == (0, 100)  # single process owns everything

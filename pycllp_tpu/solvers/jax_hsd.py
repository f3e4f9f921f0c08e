"""Registry-facing JAX HSD solvers (reference-kernel and Pallas-kernel).

Upstream parity: the NumPy ``hsd`` solver class and the OpenCL-batched
``clhsd`` class collapse onto the same jitted core here, differing only
in which :class:`KernelSet` feeds the hot path (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS
from pycllp_tpu.ops.reference import REFERENCE_KERNELS, KernelSet
from pycllp_tpu.solvers.base import BaseSolver, register_solver
from pycllp_tpu.solvers.hsd import hsd_solve_batched
from pycllp_tpu.solvers.options import Solution

__all__ = ["JaxHSDSolver", "PallasHSDSolver"]


@register_solver
class JaxHSDSolver(BaseSolver):
    """Batched HSD IPM on the default XLA kernel set.

    The whole solve is one jitted ``lax.while_loop``; per-instance
    convergence is a masked status vector (pycllp's per-work-item flags,
    re-platformed — SURVEY.md §2.3).
    """

    name = "hsd"
    aliases = ("jax_hsd",)
    kernels: KernelSet = REFERENCE_KERNELS

    def _solve_impl(self, A, b, c) -> Solution:
        return self._solve_with(A, b, c, self.kernels)

    def _solve_with(self, A, b, c, kernels) -> Solution:
        out = hsd_solve_batched(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), self.options, kernels
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        return Solution(
            x=out["x"],
            y=out["y"],
            z=out["z"],
            objective=out["objective"],
            status=out["status"],
            iterations=out["iterations"],
            rho_p=out["rho_p"],
            rho_d=out["rho_d"],
            rho_gap=out["rho_gap"],
        )


@register_solver
class PallasHSDSolver(JaxHSDSolver):
    """Batched HSD on the Pallas batch-last kernel set.

    The TPU analogue of the upstream OpenCL ``clhsd`` backend: instances
    occupy VPU lanes, the normal matrix forms on the MXU inside the
    kernel, and the factorization never touches HBM.  Per-instance (3-D)
    A and the f64 finish phase transparently fall back to XLA.
    """

    name = "hsd_pallas"
    aliases = ("clhsd", "pallas")
    kernels: KernelSet = BATCHLAST_KERNELS

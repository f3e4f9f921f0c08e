"""Registry-facing JAX HSD solvers (reference-kernel and Pallas-kernel).

Upstream parity: the NumPy ``hsd`` solver class and the OpenCL-batched
``clhsd`` class collapse onto the same jitted core here, differing only
in which :class:`KernelSet` feeds the hot path (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pycllp_tpu.ops.reference import REFERENCE_KERNELS, KernelSet
from pycllp_tpu.solvers.base import BaseSolver, register_solver
from pycllp_tpu.solvers.hsd import hsd_solve_batched
from pycllp_tpu.solvers.options import Solution

__all__ = ["JaxHSDSolver"]


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
        out = hsd_solve_batched(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), self.options, self.kernels
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

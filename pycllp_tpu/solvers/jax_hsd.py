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
from pycllp_tpu.solvers.hsd import hsd_solve_batched, hsd_solve_scan
from pycllp_tpu.solvers.options import Solution

__all__ = ["JaxHSDSolver", "PallasHSDSolver"]

_SOLUTION_KEYS = (
    "x", "y", "z", "objective", "status", "iterations",
    "rho_p", "rho_d", "rho_gap",
)


@register_solver
class JaxHSDSolver(BaseSolver):
    """Batched HSD IPM on the default XLA kernel set.

    The whole solve is one jitted ``lax.while_loop``; per-instance
    convergence is a masked status vector (pycllp's per-work-item flags,
    re-platformed — SURVEY.md §2.3).

    Large-batch throughput knobs (shared 2-D A only; see
    :func:`~pycllp_tpu.solvers.hsd.hsd_solve_scan`):

    chunk : solve the batch as a ``lax.scan`` of chunk-wide masked
        while_loops in ONE device program.
    compact_cap / compact_bucket : fused cap/compact/warm-resume sweep —
        cap every chunk, finish the slow tail compacted into one bucket.
    """

    name = "hsd"
    aliases = ("jax_hsd",)
    kernels: KernelSet = REFERENCE_KERNELS

    def __init__(
        self,
        options=None,
        *,
        chunk: int | None = None,
        compact_cap: int | None = None,
        compact_bucket: int = 8192,
        **opt_kwargs,
    ):
        super().__init__(options, **opt_kwargs)
        self.chunk = chunk
        self.compact_cap = compact_cap
        self.compact_bucket = compact_bucket
        self._warm = None  # (x, y, z) equality-coordinate solution of the
        # previous solve, kept when options.warm_start is set

    def _init_impl(self, eq) -> None:
        self._warm = None  # new structure invalidates the warm point

    def _solve_impl(self, A, b, c) -> Solution:
        return self._solve_with(A, b, c, self.kernels)

    def _solve_with(self, A, b, c, kernels) -> Solution:
        scan = (self.chunk or self.compact_cap) and getattr(A, "ndim", 2) == 2
        if scan:
            out = hsd_solve_scan(
                jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                self.options, kernels,
                chunk=self.chunk or b.shape[0], keys=_SOLUTION_KEYS,
                compact_cap=self.compact_cap,
                compact_bucket=self.compact_bucket,
            )
        else:
            warm = None
            if self.options.warm_start and self._warm is not None:
                shapes_match = (
                    self._warm[0].shape == (b.shape[0], c.shape[-1])
                    and self._warm[1].shape == b.shape
                )
                warm = self._warm if shapes_match else None
            out = hsd_solve_batched(
                jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                self.options, kernels, warm=warm,
            )
        out = {k: np.asarray(out[k]) for k in _SOLUTION_KEYS}
        if self.options.warm_start and not scan:
            self._warm = (out["x"], out["y"], out["z"])
        return Solution(**out)


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

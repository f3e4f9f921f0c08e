"""Profiling helpers: FLOP model + achieved-vs-peak accounting.

SURVEY.md §5: the benchmark harness must compute achieved-vs-peak for
the batched-Cholesky north star, so the per-iteration FLOP model lives
here, beside a thin ``jax.profiler`` wrapper.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["ipm_iteration_flops", "solve_flops", "achieved_tflops", "trace"]

# v5e single-chip peak (dense f32 via bf16 passes ≈ bf16/2; bf16 peak ≈ 394/2)
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_F32_TFLOPS = 49.0
V5E_HBM_GBPS = 819.0


def ipm_iteration_flops(m: int, n: int, n_rhs: int = 3) -> int:
    """FLOPs for one HSD iteration of one instance (dense, shared A).

    normal-eq formation 2·m²·n (as W@d: 2·m²·n), Cholesky m³/3,
    ``n_rhs`` forward+backward solves 2·n_rhs·m², ~8 A-matvecs 2·m·n
    each (residuals, sym_solve assemblies), vector ops O(n).
    """
    return int(
        2 * m * m * n  # M = W @ d
        + m**3 // 3  # Cholesky
        + 2 * n_rhs * 2 * m * m  # triangular solves
        + 8 * 2 * m * n  # matvecs
        + 20 * n  # elementwise
    )


def solve_flops(m: int, n: int, iterations, n_rhs: int = 3):
    """Total FLOPs for a batch: sum of per-instance iteration counts."""
    import numpy as np

    return int(np.sum(np.asarray(iterations)) * ipm_iteration_flops(m, n, n_rhs))


def achieved_tflops(total_flops: int, seconds: float) -> float:
    return total_flops / seconds / 1e12


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler.trace`` wrapper (view with XProf/Perfetto)."""
    with jax.profiler.trace(log_dir):
        yield

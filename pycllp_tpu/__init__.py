"""pycllp_tpu — a TPU-native batched linear-programming framework.

A from-scratch re-design (NOT a port) of the capabilities of
``jetuk/pycllp``: batched interior-point LP solving where thousands of
independent LP instances (scenarios) are solved simultaneously on TPU.

Capability parity map (upstream paths are named for orientation only; the
reference mount was empty this build — see SURVEY.md §0 — so no line
citations are possible):

=====================  =======================================  =====================
Capability             upstream (pycllp)                         here (TPU-native)
=====================  =======================================  =====================
Problem containers     ``pycllp/lp.py`` GeneralLP/StandardLP    :mod:`pycllp_tpu.models`
Solver registry        ``pycllp/solvers/__init__.py``           :mod:`pycllp_tpu.solvers`
Pure reference HSD     ``pycllp/solvers/hsd.py`` (NumPy)        :mod:`pycllp_tpu.solvers.hsd`
Native backend         vendored Vanderbei C + Cython            :mod:`pycllp_tpu.solvers.cpp` (C++/ctypes)
Device batch backend   OpenCL work-item-per-LP kernels          :mod:`pycllp_tpu.ops` Pallas kernels
Scenario batching      leading n-problems axis on b/c           batched pytrees + vmap/mask
Multi-device           (absent upstream)                        :mod:`pycllp_tpu.parallel`
LP file IO             vendored ``iolp.c`` MPS reader           :mod:`pycllp_tpu.io.mps`
=====================  =======================================  =====================
"""

__version__ = "0.1.0"

from pycllp_tpu.models import GeneralLP, StandardLP, EqualityLP, SparseMatrixBuilder
from pycllp_tpu.solvers import (
    BaseSolver,
    Solution,
    SolverOptions,
    Status,
    available_solvers,
    get_solver,
    register_solver,
    solver_registry,
)

__all__ = [
    "GeneralLP",
    "StandardLP",
    "EqualityLP",
    "SparseMatrixBuilder",
    "BaseSolver",
    "Solution",
    "SolverOptions",
    "Status",
    "available_solvers",
    "get_solver",
    "register_solver",
    "solver_registry",
    "__version__",
]

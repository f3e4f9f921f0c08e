"""Isolate WHY the wide finish fails to reach 1e-6 on the bench workload.

  F  pure f64 (reference kernels) from scratch      -> algorithm ceiling
  G  f64 interface, mixed kernels (f32 factor+IR) from scratch
                                                    -> are mixed directions enough?
  H  narrow phase + mixed finish with ir_steps=8    -> is it IR stall?
256 lanes of the 64x64 bench problem family.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_enable_x64", True)

from pycllp_tpu import SolverOptions  # noqa: E402
from pycllp_tpu.io.generate import random_standard_lp  # noqa: E402
from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS  # noqa: E402
from pycllp_tpu.ops.mixed import MixedPrecisionKernels  # noqa: E402
from pycllp_tpu.ops.reference import REFERENCE_KERNELS  # noqa: E402
from pycllp_tpu.solvers.hsd import hsd_solve_batched  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


TOTAL = int(os.environ.get("T", 256))
M = N_ = 64
lp = random_standard_lp(M, N_, nlp=TOTAL, seed=3, dtype=np.float32)
eq = lp.to_equality_form()
A64 = np.asarray(eq.A, np.float64)
b64 = np.asarray(eq.b, np.float64)
c64 = np.asarray(eq.c, np.float64)


def audit(objective, lanes=64):
    from scipy.optimize import linprog

    rels = []
    for i in np.linspace(0, TOTAL - 1, lanes, dtype=int):
        res = linprog(
            -np.asarray(lp.c)[i].astype(np.float64),
            A_ub=np.asarray(lp.A, np.float64),
            b_ub=np.asarray(lp.b)[i].astype(np.float64),
            bounds=[(0, None)] * N_,
            method="highs",
        )
        if res.status == 0:
            rels.append(abs(-float(objective[i]) + res.fun) / max(1.0, abs(res.fun)))
    return max(rels), float(np.mean(rels))


def run(label, opts, kset):
    t0 = time.time()
    out = hsd_solve_batched(A64, b64, c64, opts, kset)
    out = {k: np.asarray(v) for k, v in out.items()}
    dt = time.time() - t0
    st = out["status"]
    uniq, counts = np.unique(st, return_counts=True)
    it = out["iterations"]
    mx, mean = audit(out["objective"])
    log(
        f"[{label}] {dt:.1f}s statuses={dict(zip(uniq.tolist(), counts.tolist()))} "
        f"iters max {it.max()} audit: max {mx:.2e} mean {mean:.2e}"
    )


which = os.environ.get("V", "FGH")
if "F" in which:
    run("F pure f64", SolverOptions(tol=1e-6, maxiter=60, dtype="float64",
                                    init_point="mehrotra"), REFERENCE_KERNELS)
if "G" in which:
    run(
        "G f64 via mixed(f32 factor)",
        SolverOptions(tol=1e-6, maxiter=60, dtype="float64", init_point="mehrotra"),
        MixedPrecisionKernels(BATCHLAST_KERNELS),
    )
if "H" in which:
    from pycllp_tpu.ops.batchlast import BatchLastKernels

    kset = BatchLastKernels()
    kset._finish_kernels = MixedPrecisionKernels(kset, ir_steps=8)
    run(
        "H narrow + mixed finish ir=8",
        SolverOptions(
            tol=1e-6, maxiter=40, dtype="float32", finish_dtype="float64",
            switch_tol=1e-5, finish_maxiter=30, init_point="mehrotra",
        ),
        kset,
    )

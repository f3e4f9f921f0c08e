"""Bisect the finish-phase accuracy regression seen in exp_contract.

Variants on 4096x64^2 (TPU):
  A  narrow-only scan-compact, tol 1e-5 (round-1 headline config)
  B  batched (no scan) + f64 finish, bench stall options
  C  batched (no scan) + f64 finish, default stall options
  D  scan-compact + f64 finish, bench stall options (exp_contract repro)
  E  scan-compact + f64 finish, default stall options
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
from pycllp_tpu.solvers.hsd import hsd_solve_batched, hsd_solve_scan  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


TOTAL = int(os.environ.get("T", 4096))
M = N_ = 64
lp = random_standard_lp(M, N_, nlp=TOTAL, seed=3, dtype=np.float32)
eq = lp.to_equality_form()
A = jax.device_put(np.asarray(eq.A, np.float32))
b_all = jax.device_put(np.asarray(eq.b, np.float32))
c_all = jax.device_put(np.asarray(eq.c, np.float32))


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


def report(label, out, dt):
    st = np.asarray(out["status"])
    uniq, counts = np.unique(st, return_counts=True)
    mx, mean = audit(np.asarray(out["objective"]))
    log(
        f"[{label}] {dt:.2f}s ({TOTAL/dt:.0f} LP/s) "
        f"statuses={dict(zip(uniq.tolist(), counts.tolist()))} "
        f"audit: max {mx:.2e} mean {mean:.2e}"
    )


bench_stall = dict(stall_patience=3, stall_rtol=0.05)
dflt_stall = dict(stall_patience=12, stall_rtol=0.0)
keys = ("objective", "status", "iterations")


def run_batched(label, opts):
    t0 = time.time(); out = hsd_solve_batched(A, b_all, c_all, opts, BATCHLAST_KERNELS)
    np.asarray(out["objective"]); warm = time.time() - t0
    t0 = time.time(); out = hsd_solve_batched(A, b_all, c_all, opts, BATCHLAST_KERNELS)
    out = {k: np.asarray(v) for k, v in out.items()}
    report(f"{label} warm={warm:.0f}s", out, time.time() - t0)


def run_scan(label, opts):
    kw = dict(chunk=TOTAL, keys=keys, compact_cap=12, compact_bucket=2048, finish_cap=6)
    t0 = time.time(); out = hsd_solve_scan(A, b_all, c_all, opts, BATCHLAST_KERNELS, **kw)
    np.asarray(out["objective"]); warm = time.time() - t0
    t0 = time.time(); out = hsd_solve_scan(A, b_all, c_all, opts, BATCHLAST_KERNELS, **kw)
    out = {k: np.asarray(v) for k, v in out.items()}
    report(f"{label} warm={warm:.0f}s", out, time.time() - t0)


which = os.environ.get("V", "ABCDE")
base = dict(maxiter=40, dtype="float32", refine_steps=0, init_point="mehrotra")
fin = dict(finish_dtype="float64", switch_tol=1e-5, finish_maxiter=20)
if "A" in which:
    run_scan("A narrow scan", SolverOptions(tol=1e-5, **base, **bench_stall))
if "B" in which:
    run_batched("B batched+finish bench-stall", SolverOptions(tol=1e-6, **base, **fin, **bench_stall))
if "C" in which:
    run_batched("C batched+finish dflt-stall", SolverOptions(tol=1e-6, **base, **fin, **dflt_stall))
if "D" in which:
    run_scan("D scan+finish bench-stall", SolverOptions(tol=1e-6, **base, **fin, **bench_stall))
if "E" in which:
    run_scan("E scan+finish dflt-stall", SolverOptions(tol=1e-6, **base, **fin, **dflt_stall))

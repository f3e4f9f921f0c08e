"""Diagnose lanes left STALLED by the probe config: which lanes, and what
does a cold f64 solve (reference kernels, generous budget) do on them?"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_enable_x64", True)

from pycllp_tpu import SolverOptions
from pycllp_tpu.io.generate import random_standard_lp
from pycllp_tpu.solvers.hsd import hsd_solve_batched
from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS
from pycllp_tpu.ops.reference import REFERENCE_KERNELS

B = int(os.environ.get("PROBE_B", 256))
lp = random_standard_lp(64, 64, nlp=B, seed=3, dtype=np.float32)
eq = lp.to_equality_form()
opts = SolverOptions(
    tol=1e-6, maxiter=40, dtype="float32", stall_patience=3, stall_rtol=0.05,
    refine_steps=0, init_point="mehrotra",
    finish_dtype="float64", switch_tol=1e-5, finish_maxiter=20, finish_kset="df64",
)
out = hsd_solve_batched(
    np.asarray(eq.A, np.float32), np.asarray(eq.b, np.float32),
    np.asarray(eq.c, np.float32), opts, BATCHLAST_KERNELS,
)
st = np.asarray(out["status"]); obj = np.asarray(out["objective"])
bad = np.where(st != 0)[0]
print("bad lanes:", bad.tolist(), "statuses:", st[bad].tolist())
print("rho_p/d/gap on bad:", np.asarray(out["rho_p"])[bad], np.asarray(out["rho_d"])[bad], np.asarray(out["rho_gap"])[bad])

if len(bad):
    # cold f64 solve of the bad instances only, reference kernels, big budget
    A64 = np.asarray(eq.A, np.float64)
    b64 = np.asarray(eq.b, np.float64)[bad]
    c64 = np.asarray(eq.c, np.float64)[bad]
    o2 = SolverOptions(tol=1e-7, maxiter=80, dtype="float64", init_point="mehrotra",
                       stall_patience=25)
    r = hsd_solve_batched(A64, b64, c64, o2, REFERENCE_KERNELS)
    print("cold f64 ref: status", np.asarray(r["status"]).tolist(),
          "iters", np.asarray(r["iterations"]).tolist())
    # cold f64 through the df64 finish kernels
    fk = BATCHLAST_KERNELS.finish_kernels("df64")
    r2 = hsd_solve_batched(A64, b64, c64, o2, fk)
    print("cold df64 kset: status", np.asarray(r2["status"]).tolist(),
          "iters", np.asarray(r2["iterations"]).tolist())
    # same but with probe-like budget (30 iters, patience 8)
    o3 = SolverOptions(tol=1e-6, maxiter=30, dtype="float64", init_point="mehrotra",
                       stall_patience=8)
    r3 = hsd_solve_batched(A64, b64, c64, o3, fk)
    print("cold df64 probe-budget: status", np.asarray(r3["status"]).tolist(),
          "iters", np.asarray(r3["iterations"]).tolist())
    from scipy.optimize import linprog
    for j, i in enumerate(bad):
        res = linprog(-np.asarray(lp.c)[i].astype(np.float64), A_ub=np.asarray(lp.A, np.float64),
                      b_ub=np.asarray(lp.b)[i].astype(np.float64), bounds=[(0, None)] * 64, method="highs")
        print(f"lane {i}: scipy status {res.status} obj {res.fun:.9g}; "
              f"probe obj {-obj[i]:.9g}; cold-ref obj {-np.asarray(r['objective'])[j]:.9g}")

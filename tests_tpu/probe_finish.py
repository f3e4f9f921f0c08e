"""On-chip probe: 256-lane 64x64 batched solve with the df64 finish phase.

The round-2 postmortem pattern (VERDICT.md r2 item 1): a single run that
reproduces the wide-phase health of the full bench at 1/256 the lanes.
Usage:  timeout 580 python tests_tpu/probe_finish.py [finish_kset]
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_enable_x64", True)

from pycllp_tpu import SolverOptions
from pycllp_tpu.io.generate import random_standard_lp
from pycllp_tpu.solvers.hsd import hsd_solve_batched
from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS

fk = sys.argv[1] if len(sys.argv) > 1 else "df64"
B = int(os.environ.get("PROBE_B", 256))
print("backend:", jax.default_backend(), "finish_kset:", fk, "B:", B, flush=True)
lp = random_standard_lp(64, 64, nlp=B, seed=3, dtype=np.float32)
eq = lp.to_equality_form()
opts = SolverOptions(
    tol=1e-6, maxiter=40, dtype="float32", stall_patience=3, stall_rtol=0.05,
    refine_steps=0, init_point="mehrotra",
    finish_dtype="float64", switch_tol=1e-5, finish_maxiter=20, finish_kset=fk,
)
t0 = time.time()
out = hsd_solve_batched(
    np.asarray(eq.A, np.float32), np.asarray(eq.b, np.float32),
    np.asarray(eq.c, np.float32), opts, BATCHLAST_KERNELS,
)
obj = np.asarray(out["objective"])
print(f"warmup+run: {time.time()-t0:.1f}s", flush=True)
st = np.asarray(out["status"])
u, c = np.unique(st, return_counts=True)
print("statuses:", dict(zip(u.tolist(), c.tolist())), flush=True)
from scipy.optimize import linprog
errs = {}
for i in np.linspace(0, B - 1, 64, dtype=int):
    r = linprog(-np.asarray(lp.c)[i].astype(np.float64), A_ub=np.asarray(lp.A, np.float64),
                b_ub=np.asarray(lp.b)[i].astype(np.float64), bounds=[(0, None)] * 64, method="highs")
    if r.status == 0:
        errs.setdefault(int(st[i]), []).append(abs(-float(obj[i]) + r.fun) / max(1, abs(r.fun)))
allr = [e for v in errs.values() for e in v]
print(f"audit: max {max(allr):.2e} mean {np.mean(allr):.2e}")
for k, v in sorted(errs.items()):
    print(f"  status {k}: n={len(v)} max={max(v):.2e}")
ok = (st == 0).mean() > 0.5 and max(allr) <= 1e-6
print("PROBE", "PASS" if ok else "FAIL")

"""Time the fused compact scan vs the plain scan on the bench workload."""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pycllp_tpu import SolverOptions
from pycllp_tpu.io.generate import random_standard_lp
from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS, BATCHLAST_FUSED_KERNELS
from pycllp_tpu.solvers.hsd import hsd_solve_scan

KSET = BATCHLAST_FUSED_KERNELS if os.environ.get("EXP_FUSE") else BATCHLAST_KERNELS

M, N, TOTAL = 64, 64, 65536
opts = SolverOptions(tol=1e-5, maxiter=40, dtype="float32",
                     stall_patience=4, refine_steps=0, init_point="mehrotra")

lp = random_standard_lp(M, N, nlp=TOTAL, seed=3, dtype=np.float32)
eq = lp.to_equality_form()
A = jax.device_put(np.asarray(eq.A, np.float32))
b_all = jax.device_put(np.asarray(eq.b, np.float32))
c_all = jax.device_put(np.asarray(eq.c, np.float32))

configs = []
for arg in sys.argv[1:]:
    chunk, cap, bucket = (int(v) for v in arg.split(","))
    configs.append((chunk, cap or None, bucket))
if not configs:
    configs = [(16384, None, 0), (16384, 13, 8192), (8192, 13, 8192),
               (16384, 14, 2048), (16384, 12, 16384)]


def make_run(chunk, cap, bucket):
    def run():
        out = hsd_solve_scan(A, b_all, c_all, opts, KSET, chunk=chunk,
                             keys=("objective", "status", "iterations"),
                             compact_cap=cap, compact_bucket=bucket)
        return {k: np.asarray(v) for k, v in out.items()}
    return run


runs, best, outs = [], {}, {}
for cfg in configs:
    run = make_run(*cfg)
    t0 = time.time(); outs[cfg] = run(); print(f"{cfg}: warmup {time.time()-t0:.0f}s", flush=True)
    runs.append((cfg, run))
    best[cfg] = float("inf")
# interleaved round-robin: tunnel drift hits all configs equally
for cycle in range(4):
    for cfg, run in runs:
        t0 = time.time(); run(); best[cfg] = min(best[cfg], time.time() - t0)
for cfg, _ in runs:
    out = outs[cfg]
    st = np.bincount(out["status"], minlength=6)
    print(f"chunk={cfg[0]} cap={cfg[1]} bucket={cfg[2]}: best {best[cfg]:.3f}s "
          f"-> {TOTAL/best[cfg]:.0f} LP/s  statuses={st.tolist()} itermax={out['iterations'].max()}",
          flush=True)

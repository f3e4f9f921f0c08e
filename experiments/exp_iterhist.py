"""Measure iteration histogram + chunk-size scaling on the bench workload.

Drives the same distribution as bench.py config 3 to answer:
  1. what fraction of lanes is still RUNNING at iteration cap K (remnant
     fraction for a two-pass design);
  2. how scan wall time scales with chunk size (is per-iteration cost
     linear in lanes below 16384?).
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pycllp_tpu import SolverOptions
from pycllp_tpu.io.generate import random_standard_lp
from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS
from pycllp_tpu.solvers.hsd import hsd_solve_scan

M, N, TOTAL = 64, 64, 65536
opts = SolverOptions(tol=1e-5, maxiter=40, dtype="float32",
                     stall_patience=4, refine_steps=0, init_point="mehrotra")

lp = random_standard_lp(M, N, nlp=TOTAL, seed=3, dtype=np.float32)
eq = lp.to_equality_form()
A = jax.device_put(np.asarray(eq.A, np.float32))
b_all = jax.device_put(np.asarray(eq.b, np.float32))
c_all = jax.device_put(np.asarray(eq.c, np.float32))

mode = sys.argv[1] if len(sys.argv) > 1 else "hist"

if mode == "hist":
    out = hsd_solve_scan(A, b_all, c_all, opts, BATCHLAST_KERNELS,
                         chunk=16384, keys=("iterations", "status"))
    iters = np.asarray(out["iterations"])
    print("iteration histogram (lane terminated at k):")
    hist = np.bincount(iters, minlength=41)
    for k, cnt in enumerate(hist):
        if cnt:
            print(f"  {k:3d}: {cnt:6d}  ({cnt/TOTAL:6.2%})")
    print(f"mean {iters.mean():.2f}  p50 {np.percentile(iters,50):.0f} "
          f"p90 {np.percentile(iters,90):.0f} p99 {np.percentile(iters,99):.0f} max {iters.max()}")
    for cap in (8, 9, 10, 11, 12, 13, 14, 16):
        frac = (iters > cap).mean()
        print(f"remnant fraction at cap {cap:2d}: {frac:6.2%} ({int(frac*TOTAL)} lanes)")
    # per-chunk max (the cost driver for the scan)
    per_chunk = iters.reshape(4, 16384)
    print("per-chunk max:", per_chunk.max(axis=1), " per-chunk mean:", per_chunk.mean(axis=1).round(1))
elif mode == "chunks":
    for chunk in (4096, 8192, 16384, 32768):
        def run():
            out = hsd_solve_scan(A, b_all, c_all, opts, BATCHLAST_KERNELS,
                                 chunk=chunk, keys=("objective",))
            return np.asarray(out["objective"])
        t0 = time.time(); run(); print(f"chunk {chunk}: warmup {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time(); run(); best = min(best, time.time() - t0)
        print(f"chunk {chunk:6d}: best {best:.3f}s -> {TOTAL/best:.0f} LP/s", flush=True)

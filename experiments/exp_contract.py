"""Measure the 1e-6-contract configuration's throughput on the real chip.

VERDICT round-1 item 1: the headline number must come from a config that
meets the 1e-6 relative-gap contract (BASELINE.md "Correctness" row).
This experiment sweeps the finish-phase knobs of the fused scan-compact
(hsd_solve_scan with finish_dtype) and reports LP/s + status histogram +
a scipy audit over >=64 lanes.

Run on the TPU:  python experiments/exp_contract.py
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
from pycllp_tpu.solvers.hsd import hsd_solve_scan  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def audit(lp, objective, n, total, lanes=64):
    from scipy.optimize import linprog

    rels = []
    for i in np.linspace(0, total - 1, lanes, dtype=int):
        res = linprog(
            -np.asarray(lp.c)[i].astype(np.float64),
            A_ub=np.asarray(lp.A, np.float64),
            b_ub=np.asarray(lp.b)[i].astype(np.float64),
            bounds=[(0, None)] * n,
            method="highs",
        )
        if res.status == 0:
            rels.append(abs(-float(objective[i]) + res.fun) / max(1.0, abs(res.fun)))
    return max(rels), float(np.mean(rels)), len(rels)


def run(total, chunk, opts, cap, bucket, finish_cap, label):
    m = n = 64
    lp = random_standard_lp(m, n, nlp=total, seed=3, dtype=np.float32)
    eq = lp.to_equality_form()
    A = jax.device_put(np.asarray(eq.A, np.float32))
    b_all = jax.device_put(np.asarray(eq.b, np.float32))
    c_all = jax.device_put(np.asarray(eq.c, np.float32))
    keys = ("objective", "status", "iterations")

    def solve():
        return hsd_solve_scan(
            A, b_all, c_all, opts, BATCHLAST_KERNELS, chunk=chunk, keys=keys,
            compact_cap=cap, compact_bucket=bucket, finish_cap=finish_cap,
        )

    t0 = time.time()
    out = solve()
    np.asarray(out["objective"])
    log(f"[{label}] warmup {time.time()-t0:.1f}s")
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        out = solve()
        obj = np.asarray(out["objective"])
        dt = time.time() - t0
        best = min(best, dt)
        log(f"[{label}] repeat {r}: {dt:.3f}s -> {total/dt:.0f} LP/s")
    st = np.asarray(out["status"])
    uniq, counts = np.unique(st, return_counts=True)
    mx, mean, k = audit(lp, obj, n, total)
    log(
        f"[{label}] {total/best:.0f} LP/s  statuses={dict(zip(uniq.tolist(), counts.tolist()))}"
        f"  audit({k}): max {mx:.2e} mean {mean:.2e}"
    )
    return total / best, mx


if __name__ == "__main__":
    total = int(os.environ.get("T", 16384))
    chunk = int(os.environ.get("CHUNK", 16384))
    fcap = int(os.environ.get("FCAP", 3))
    fmax = int(os.environ.get("FMAX", 20))
    patience = int(os.environ.get("PAT", 3))
    gondzio = int(os.environ.get("GONDZIO", 0))
    form = os.environ.get("FORM", "ozaki")  # ozaki | f64 | fast
    bucket = int(os.environ.get("BUCKET", 5120))
    if form != "ozaki":
        from pycllp_tpu.ops.batchlast import BatchLastKernels
        from pycllp_tpu.ops.df64 import DoubleSingleKernels

        kset = BatchLastKernels()
        kset._finish_kernels = DoubleSingleKernels(form=form)
        globals()["BATCHLAST_KERNELS"] = kset
    # contract config: tol 1e-6, f32 bulk + df64 finish (ops/df64.py)
    base = SolverOptions(
        tol=1e-6, maxiter=40, dtype="float32",
        stall_patience=patience, stall_rtol=0.05, refine_steps=0,
        init_point="mehrotra", finish_dtype="float64",
        switch_tol=1e-5, finish_maxiter=fmax, finish_gondzio=gondzio,
    )
    run(total, chunk, base, cap=12, bucket=bucket, finish_cap=fcap,
        label=f"contract fcap={fcap} gz={gondzio} form={form}")

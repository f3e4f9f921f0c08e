"""Benchmark harness: batched 64x64 LP throughput per chip (BASELINE.md).

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "LP/s", "vs_baseline": N/1e5}
Diagnostics (status mix, objective accuracy vs scipy, per-config numbers)
go to stderr.

Configs measured (BASELINE.json):
  main   — 65,536 dense 64x64 LPs (scenario-per-lane), f32, shared A,
           solved in chunks; the headline LPs/s/chip number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pycllp_tpu import SolverOptions, Status  # noqa: E402
from pycllp_tpu.io.generate import random_standard_lp  # noqa: E402
from pycllp_tpu.solvers.hsd import hsd_solve_batched  # noqa: E402

BASELINE_LPS_PER_SEC = 1.0e5  # BASELINE.json north-star

M = int(os.environ.get("BENCH_M", 64))
N = int(os.environ.get("BENCH_N", 64))
TOTAL = int(os.environ.get("BENCH_TOTAL", 65536))
CHUNK = int(os.environ.get("BENCH_CHUNK", 16384))
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_options() -> SolverOptions:
    # practical f32 config: 1e-5 indicator tol (objective accuracy lands
    # ~1e-6 relative; checked below), early stall cutoff to avoid burning
    # iterations at the f32 floor.
    return SolverOptions(tol=1e-5, maxiter=40, dtype="float32", stall_patience=6)


def main():
    log(f"devices: {jax.devices()}")
    lp = random_standard_lp(M, N, nlp=TOTAL, seed=3, dtype=np.float32)
    eq = lp.to_equality_form()
    A = jax.device_put(np.asarray(eq.A, np.float32))
    b_all = np.asarray(eq.b, np.float32)
    c_all = np.asarray(eq.c, np.float32)
    opts = bench_options()

    def solve_chunk(b, c):
        out = hsd_solve_batched(A, b, c, opts)
        return out["objective"], out["status"], out["iterations"]

    # warmup/compile
    t0 = time.time()
    obj, st, it = solve_chunk(b_all[:CHUNK], c_all[:CHUNK])
    jax.block_until_ready(obj)
    log(f"warmup (incl compile): {time.time() - t0:.1f}s")

    n_chunks = TOTAL // CHUNK
    best = float("inf")
    for r in range(REPEATS):
        objs, stats, iters = [], [], []
        t0 = time.time()
        for k in range(n_chunks):
            sl = slice(k * CHUNK, (k + 1) * CHUNK)
            o, s, i = solve_chunk(b_all[sl], c_all[sl])
            objs.append(o)
            stats.append(s)
            iters.append(i)
        jax.block_until_ready(objs)
        dt = time.time() - t0
        best = min(best, dt)
        log(f"repeat {r}: {dt:.3f}s -> {TOTAL / dt:.0f} LP/s")

    status = np.concatenate([np.asarray(s) for s in stats])
    iterations = np.concatenate([np.asarray(i) for i in iters])
    objective = np.concatenate([np.asarray(o) for o in objs])
    uniq, counts = np.unique(status, return_counts=True)
    log(f"statuses: {dict(zip(uniq.tolist(), counts.tolist()))}")
    log(
        f"iterations min/mean/max: {iterations.min()}/{iterations.mean():.1f}/{iterations.max()}"
    )

    # objective-accuracy spot check vs scipy (the 1e-6 relative-gap contract)
    try:
        from scipy.optimize import linprog

        rels = []
        for i in np.linspace(0, TOTAL - 1, 8, dtype=int):
            res = linprog(
                -np.asarray(lp.c)[i].astype(np.float64),
                A_ub=np.asarray(lp.A, np.float64),
                b_ub=np.asarray(lp.b)[i].astype(np.float64),
                bounds=[(0, None)] * N,
                method="highs",
            )
            if res.status == 0:
                # equality-form objective is the negated Vanderbei-form one
                std_obj = -float(objective[i])
                rels.append(abs(std_obj - (-res.fun)) / max(1.0, abs(res.fun)))
        log(f"objective rel-err vs scipy (8 lanes): max {max(rels):.2e} mean {np.mean(rels):.2e}")
    except Exception as e:  # pragma: no cover
        log(f"accuracy check skipped: {e}")

    lps = TOTAL / best
    print(
        json.dumps(
            {
                "metric": "LPs solved/sec/chip (batched 64x64 dense)",
                "value": round(lps, 1),
                "unit": "LP/s",
                "vs_baseline": round(lps / BASELINE_LPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

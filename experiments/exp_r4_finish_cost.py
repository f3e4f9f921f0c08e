"""Round-4: where does the 1.66 s finish stage go?

Extends exp_crossover_cost with the d-side Ozaki slicing alone, a full
vertex_candidate, and the df64 solve — the stage-3/4 building blocks —
at bench chunk scale (B=16384).  Chained-K methodology.

Usage: timeout 1800 python experiments/exp_r4_finish_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_enable_x64", True)

B, m, n = 16384, 64, 128
K = 8
rng = np.random.default_rng(0)
A64 = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), jnp.float64)
x64 = jnp.asarray(rng.normal(size=(B, n)), jnp.float64)
b64 = jnp.asarray(rng.normal(size=(B, m)), jnp.float64)
c64 = jnp.asarray(rng.normal(size=(B, n)), jnp.float64)
xi = jnp.asarray(rng.uniform(1e-8, 10.0, size=(B, n)), jnp.float64)
zi = jnp.asarray(rng.uniform(1e-8, 10.0, size=(B, n)), jnp.float64)

from pycllp_tpu.ops.df64 import _df_slice_int, ozaki_params, DF64_FINISH_KERNELS
from pycllp_tpu.ops.mixed import MIXED_IR1_KERNELS
from pycllp_tpu.solvers.crossover import crossover_candidate

ctx_m = MIXED_IR1_KERNELS.prepare(A64)
ctx_df = DF64_FINISH_KERNELS.prepare(A64)
s_, ns_, cut_ = ozaki_params(n)


def chained(fn, x0):
    @jax.jit
    def run(x):
        def body(_, carry):
            out = fn(carry)
            return carry + 0.0 * out.reshape(-1)[0].astype(carry.dtype)
        return lax.fori_loop(0, K, body, x)
    return run


def bench(name, fn, x0):
    run = chained(fn, x0)
    np.asarray(run(x0))
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        np.asarray(run(x0))
        best = min(best, time.time() - t0)
    print(f"{name:40s}: {1e3 * best / K:8.3f} ms/apply", flush=True)
    return best / K


with jax.default_matmul_precision("highest"):
    bench(
        "d-side slice only (10 slices, f64 in)",
        lambda c: _df_slice_int(x64.T + 0 * c[0], 0, s=s_, n_slices=ns_)[0][0],
        x64[:, 0],
    )
    bench(
        "ozaki mv (A@x) full",
        lambda c: MIXED_IR1_KERNELS.mv(ctx_m, x64 + 0 * c[0]),
        x64[:, 0],
    )
    fac_m = MIXED_IR1_KERNELS.factor(ctx_m, xi, 1e-12)
    bench(
        "mixed1 solve pair (ir=1)",
        lambda c: MIXED_IR1_KERNELS.solve(fac_m, (b64 + 0 * c[0], b64))[0],
        b64[:, 0],
    )
    bench(
        "vertex crossover full (refine=1, repair=0)",
        lambda c: crossover_candidate(
            ctx_m, b64 + 0 * c[0], c64, xi, zi, MIXED_IR1_KERNELS,
            refine=1, repair=0,
        )[0],
        b64[:, 0],
    )
    bench(
        "vertex crossover full (refine=1, repair=2)",
        lambda c: crossover_candidate(
            ctx_m, b64 + 0 * c[0], c64, xi, zi, MIXED_IR1_KERNELS,
            refine=1, repair=2,
        )[0],
        b64[:, 0],
    )
    fac_df = DF64_FINISH_KERNELS.factor(ctx_df, xi, 1e-12)
    bench(
        "df64 solve pair",
        lambda c: DF64_FINISH_KERNELS.solve(fac_df, (b64 + 0 * c[0], b64))[0],
        b64[:, 0],
    )

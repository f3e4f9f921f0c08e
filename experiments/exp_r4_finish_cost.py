"""Round-4: where does the finish stage go? (post-slicing-rewrite)

Measures the stage-3/4 building blocks at bench chunk scale (B=16384)
with the chained-K methodology.  Contexts are passed as JIT ARGUMENTS —
closing over them folds the Ozaki slice groups into the HLO as literals
and the remote-compile tunnel rejects the request (HTTP 413, measured).

Usage: timeout 2400 python experiments/exp_r4_finish_cost.py
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

from pycllp_tpu.ops.df64 import (
    _df_slice_int, ozaki_params, ozaki_mv_params, DF64_FINISH_KERNELS,
)
from pycllp_tpu.ops.mixed import MIXED_IR1_KERNELS
from pycllp_tpu.solvers.crossover import crossover_candidate

ctx_m = MIXED_IR1_KERNELS.prepare(A64)
ctx_df = DF64_FINISH_KERNELS.prepare(A64)
s66, ns66, _ = ozaki_params(n)
s48, ns48, _ = ozaki_mv_params(n)


def bench(name, fn, x0, *ops):
    @jax.jit
    def run(x, *ops_):
        def body(_, carry):
            out = fn(carry, *ops_)
            return carry + 0.0 * out.reshape(-1)[0].astype(carry.dtype)
        return lax.fori_loop(0, K, body, x)

    np.asarray(run(x0, *ops))
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        np.asarray(run(x0, *ops))
        best = min(best, time.time() - t0)
    print(f"{name:44s}: {1e3 * best / K:8.3f} ms/apply", flush=True)
    return best / K


with jax.default_matmul_precision("highest"):
    bench(
        "d-slice v2 (66-bit, 10 slices)",
        lambda c, X: _df_slice_int(X.T + 0 * c[0], 0, s=s66, n_slices=ns66)[0][0],
        x64[:, 0], x64,
    )
    bench(
        "d-slice v2 (48-bit mv width)",
        lambda c, X: _df_slice_int(X.T + 0 * c[0], 0, s=s48, n_slices=ns48)[0][0],
        x64[:, 0], x64,
    )
    bench(
        "ozaki mv 48-bit (A@x) full",
        lambda c, ctx, X: MIXED_IR1_KERNELS.mv(ctx, X + 0 * c[0]),
        x64[:, 0], ctx_m, x64,
    )
    bench(
        "mixed1 solve pair (ir=1)",
        lambda c, ctx, bb: MIXED_IR1_KERNELS.solve(
            MIXED_IR1_KERNELS.factor(ctx, xi, 1e-12), (bb + 0 * c[0], bb)
        )[0],
        b64[:, 0], ctx_m, b64,
    )
    bench(
        "vertex crossover (refine=1, repair=0)",
        lambda c, ctx, bb: crossover_candidate(
            ctx, bb + 0 * c[0], c64, xi, zi, MIXED_IR1_KERNELS,
            refine=1, repair=0,
        )[0],
        b64[:, 0], ctx_m, b64,
    )
    bench(
        "vertex crossover (refine=1, repair=2)",
        lambda c, ctx, bb: crossover_candidate(
            ctx, bb + 0 * c[0], c64, xi, zi, MIXED_IR1_KERNELS,
            refine=1, repair=2,
        )[0],
        b64[:, 0], ctx_m, b64,
    )
    bench(
        "df64 factor (generic d, 66-bit form)",
        lambda c, ctx, dd: DF64_FINISH_KERNELS.factor(ctx, dd + 0 * c[0], 1e-12).Lh,
        xi[:, 0], ctx_df, xi,
    )
    bench(
        "df64 solve pair",
        lambda c, ctx, bb: DF64_FINISH_KERNELS.solve(
            DF64_FINISH_KERNELS.factor(ctx, xi, 1e-12), (bb + 0 * c[0], bb)
        )[0],
        b64[:, 0], ctx_df, b64,
    )

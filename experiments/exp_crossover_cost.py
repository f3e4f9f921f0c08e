"""On-chip micro-costs of the crossover stage-3 primitives (round 3b).

Times each candidate-stage building block at bench chunk scale
(B=16384, m=64, n=128) with the chained-K methodology from
docs/PERFORMANCE.md: K applications inside one jitted fori_loop with a
0.0*out carry dependency, minus an empty-loop baseline.  Grounds the
stage-3 cost model before the next full-bench sizing run.

Usage: timeout 900 python experiments/exp_crossover_cost.py
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
y64 = jnp.asarray(rng.normal(size=(B, m)), jnp.float64)
score = jnp.asarray(rng.normal(size=(B, n)), jnp.float64)
d32 = jnp.asarray(rng.uniform(0.5, 2.0, size=(B, n)), jnp.float32)
r32 = jnp.asarray(rng.normal(size=(B, m)), jnp.float32)

from pycllp_tpu.ops.batchlast import BATCHLAST_KERNELS
from pycllp_tpu.ops.mixed import MIXED_IR1_KERNELS

ctx_m = MIXED_IR1_KERNELS.prepare(A64)
ctx_bl = BATCHLAST_KERNELS.prepare(np.asarray(A64, np.float32))
fac32 = BATCHLAST_KERNELS.factor(ctx_bl, d32, 2e-6)


def chained(fn, x0):
    @jax.jit
    def run(x):
        def body(_, carry):
            out = fn(carry)
            # 0*NaN-unfoldable dependency keeps the op alive
            return carry + 0.0 * out.reshape(-1)[0].astype(carry.dtype)
        return lax.fori_loop(0, K, body, x)
    return run


def bench(name, fn, x0):
    run = chained(fn, x0)
    np.asarray(run(x0))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        np.asarray(run(x0))
        best = min(best, time.time() - t0)
    print(f"{name:34s}: {1e3 * best / K:7.3f} ms/apply", flush=True)
    return best / K


@jax.jit
def empty(x):
    return lax.fori_loop(0, K, lambda _, c: c + 0.0, x)


np.asarray(empty(x64[:, 0]))

with jax.default_matmul_precision("highest"):
    bench("ozaki mv (A@x)", lambda c: MIXED_IR1_KERNELS.mv(ctx_m, x64 + 0 * c[0]), x64[:, 0])
    bench("ozaki rmv (A^T@y)", lambda c: MIXED_IR1_KERNELS.rmv(ctx_m, y64 + 0 * c[0]), y64[:, 0])
    bench("einsum f64 mv", lambda c: jnp.einsum("mn,bn->bm", A64, x64 + 0 * c[0]), x64[:, 0])
    bench("f32 mv", lambda c: jnp.einsum("mn,bn->bm", ctx_bl.A, (x64 + 0 * c[0]).astype(jnp.float32)), x64[:, 0])
    bench("top_k+scatter indicator", lambda c: (
        jnp.zeros_like(score).at[
            jnp.arange(B)[:, None], lax.top_k(score + 0 * c[0], m)[1]
        ].set(1.0)
    ), score[:, 0])

    def sort_indicator(c):
        s = score + 0 * c[0]
        cut = jnp.sort(s, axis=-1)[:, n - m][:, None]
        gt = s > cut
        need = m - jnp.sum(gt, axis=-1, keepdims=True)
        eq = s == cut
        take = eq & (jnp.cumsum(eq, axis=-1) <= need)
        return (gt | take).astype(s.dtype)

    bench("sort-cutoff indicator", sort_indicator, score[:, 0])
    bench("f32 factor", lambda c: BATCHLAST_KERNELS.factor(ctx_bl, d32 + 0 * c[0].astype(jnp.float32), 2e-6).L, d32[:, 0])
    bench("f32 solve pair", lambda c: BATCHLAST_KERNELS.solve(fac32, (r32 + 0 * c[0].astype(jnp.float32), r32))[0], r32[:, 0])
    bench("mixed1 factor (0/1 d)", lambda c: MIXED_IR1_KERNELS.factor(ctx_m, (d32 + 0 * c[0].astype(jnp.float32)).astype(jnp.float64), 1e-12).fac_lo.L, d32[:, 0])
    fac_m = MIXED_IR1_KERNELS.factor(ctx_m, jnp.asarray(d32, jnp.float64), 1e-12)
    bench("mixed1 solve pair (ir=1)", lambda c: MIXED_IR1_KERNELS.solve(fac_m, (y64 + 0 * c[0], y64))[0], y64[:, 0])
try:
    from pycllp_tpu.ops.df64 import DF64_FINISH_KERNELS

    ctx_df = DF64_FINISH_KERNELS.prepare(A64)
    d64 = jnp.asarray(d32, jnp.float64)
    with jax.default_matmul_precision("highest"):
        bench("df64 factor", lambda c: DF64_FINISH_KERNELS.factor(ctx_df, d64 + 0 * c[0], 1e-12).Lh, d32[:, 0].astype(jnp.float64))
except Exception as e:  # pragma: no cover
    print("df64 factor: FAILED", e)

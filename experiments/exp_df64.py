"""Micro-benchmark the df64 finish-phase pieces on the real chip.

Chained-K methodology (docs/PERFORMANCE.md): K applications inside one
jitted fori_loop with a `0.0*out` carry dependency, ONE scalar pull at
the end — naive per-apply timing here pulls 0.5 GB results through the
remote tunnel and measures the transfer, not the kernel (first version
of this file reported 2.3 s for a 7 ms matmul that way).

Pieces at B=16384, m=64 (equality n=128) — the bench wide phase:
  - f64 normal-matrix formation (W @ dT, emulated f64 matmul)
  - df64 Cholesky kernel (given a formed hi/lo M)
  - df64 2-RHS triangular solve kernel
  - one full wide IPM iteration (delta of 3-vs-1 `_run_phase` iters)
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from pycllp_tpu.io.generate import random_standard_lp  # noqa: E402
from pycllp_tpu.ops.df64 import (  # noqa: E402
    DF64_FINISH_KERNELS,
    _df_chol_bl,
    _df_solve_bl,
    _split_hi_lo,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


B = int(os.environ.get("B", 16384))
M = 64
K = int(os.environ.get("K", 8))

lp = random_standard_lp(M, M, nlp=B, seed=3, dtype=np.float32)
eq = lp.to_equality_form()
A = jnp.asarray(np.asarray(eq.A), jnp.float64)
kset = DF64_FINISH_KERNELS
ctx = kset.prepare(A)
rng = np.random.default_rng(0)
d0 = jnp.asarray(np.abs(rng.standard_normal((B, A.shape[1]))) + 1e-3, jnp.float64)
M64 = (ctx.W @ d0.T).reshape(M, M, B)
Mh0, Ml0 = _split_hi_lo(M64)
reg0 = jnp.full((B,), 1e-7, jnp.float32)
Rh0 = jnp.asarray(rng.standard_normal((2, M, B)), jnp.float32)
Rl0 = jnp.zeros_like(Rh0)


def chained(label, step, carry0):
    """Time K chained applications; step(carry) -> carry (scalar-coupled)."""

    @jax.jit
    def go(c0):
        return jax.lax.fori_loop(0, K, lambda _, c: step(c), c0)

    float(go(carry0))  # warm (compile)
    t0 = time.time()
    out = float(go(carry0))
    dt = (time.time() - t0) / K
    log(f"{label}: {1000*dt:.2f} ms/apply   (carry {out:.3e})")
    return dt


# 1. f64 M formation (W @ dT)
def form_step(c):
    Mx = (ctx.W @ (d0 + c * 0.0).T).reshape(M, M, B)
    return c + 0.0 * Mx[0, 0, 0]

chained("M formation (W@dT f64 emulated)", form_step, jnp.float64(0))


# 2. df64 Cholesky kernel alone
def chol_step(c):
    Lh, Ll, Dh, Dl = _df_chol_bl(Mh0 + jnp.float32(c) * 0.0, Ml0, reg0, m=M)
    return c + 0.0 * Lh[0, 0, 0].astype(jnp.float64)

chained("df64 Cholesky kernel", chol_step, jnp.float64(0))

# 3. df64 solve kernel (2 RHS)
Lh, Ll, Dh, Dl = _df_chol_bl(Mh0, Ml0, reg0, m=M)


def solve_step(c):
    Vh, Vl = _df_solve_bl(Lh, Ll, Dh, Dl, Rh0 + jnp.float32(c) * 0.0, Rl0, m=M, k_rhs=2)
    return c + 0.0 * Vh[0, 0, 0].astype(jnp.float64)

chained("df64 solve kernel 2-RHS", solve_step, jnp.float64(0))

# 4. full wide iteration: (3 iters) - (1 iter) halved
from pycllp_tpu.solvers.hsd import _fresh_state, _run_phase  # noqa: E402
from pycllp_tpu.solvers.options import SolverOptions  # noqa: E402

opts = SolverOptions(tol=1e-14, maxiter=100, dtype="float64", stall_patience=100)
b64 = jnp.asarray(np.asarray(eq.b), jnp.float64)
c64 = jnp.asarray(np.asarray(eq.c), jnp.float64)


def run_k(k):
    @jax.jit
    def go(bb, cc):
        st = _fresh_state(ctx, bb, cc, opts, kset, jnp.float64)
        st = _run_phase(ctx, bb, cc, st, opts, kset, jnp.float64, 1e-14, k, jnp.any)
        return st.x[0, 0]

    float(go(b64, c64))
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = float(go(b64, c64))
    return (time.time() - t0) / reps

t1 = run_k(1)
t3 = run_k(3)
log(f"wide IPM iteration (delta (3-1)/2): {1000*(t3-t1)/2:.1f} ms  (k=1 total {1000*t1:.1f} ms)")

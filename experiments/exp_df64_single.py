"""Single-apply df64 kernel timings (dispatch-baseline-subtracted).

The chained-fori variant trips the remote-compile tunnel's payload
limit on the pallas kernels, so: time one apply + scalar pull, REPS
times, and subtract a no-op dispatch baseline measured the same way.
Coarser than chaining (±1-2 ms) but enough to rank the wide-phase costs.
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

import jax.numpy as jnp  # noqa: E402

from pycllp_tpu.io.generate import random_standard_lp  # noqa: E402
from pycllp_tpu.ops.batchlast import _chol_bl, _solve_bl  # noqa: E402
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
REPS = int(os.environ.get("REPS", 10))

lp = random_standard_lp(M, M, nlp=B, seed=3, dtype=np.float32)
eq = lp.to_equality_form()
A = jnp.asarray(np.asarray(eq.A), jnp.float64)
kset = DF64_FINISH_KERNELS
ctx = kset.prepare(A)
rng = np.random.default_rng(0)
d0 = jnp.asarray(np.abs(rng.standard_normal((B, A.shape[1]))) + 1e-3, jnp.float64)
M64 = (ctx.W @ d0.T).reshape(M, M, B)
Mh0, Ml0 = _split_hi_lo(M64)
M32 = M64.astype(jnp.float32)
reg0 = jnp.full((B,), 1e-7, jnp.float32)
Rh0 = jnp.asarray(rng.standard_normal((2, M, B)), jnp.float32)
Rl0 = jnp.zeros_like(Rh0)
W32 = ctx.W.astype(jnp.float32)
d32 = d0.T.astype(jnp.float32)


def timed(label, fn, *args, baseline=0.0):
    f = jax.jit(fn)
    out = f(*args)
    float(np.asarray(out))  # warm
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
    float(np.asarray(out))
    dt = (time.time() - t0) / REPS - baseline
    log(f"{label}: {1000*dt:.2f} ms")
    return dt


base = timed("no-op dispatch baseline", lambda x: x[0, 0, 0], Mh0)
timed("f32 W@dT formation", lambda w, d: (w @ d)[0, 0], W32, d32, baseline=base)
timed("f64 W@dT formation (emulated)", lambda d: (ctx.W @ d.T).reshape(M, M, B)[0, 0, 0], d0, baseline=base)
timed(
    "f32 Cholesky kernel",
    lambda m_, r_: _chol_bl(m_, r_, m=M)[0][0, 0, 0],
    M32, reg0, baseline=base,
)
timed(
    "df64 Cholesky kernel",
    lambda mh, ml, r_: _df_chol_bl(mh, ml, r_, m=M)[0][0, 0, 0],
    Mh0, Ml0, reg0, baseline=base,
)
Lh, Ll, Dh, Dl = _df_chol_bl(Mh0, Ml0, reg0, m=M)
L32, D32 = _chol_bl(M32, reg0, m=M)
timed(
    "f32 solve 2-RHS kernel",
    lambda l_, d_, r_: _solve_bl(l_, d_, r_, m=M, k_rhs=2)[0, 0, 0],
    L32, D32, Rh0, baseline=base,
)
timed(
    "df64 solve 2-RHS kernel",
    lambda lh, ll, dh, dl, rh, rl: _df_solve_bl(lh, ll, dh, dl, rh, rl, m=M, k_rhs=2)[0][0, 0, 0],
    Lh, Ll, Dh, Dl, Rh0, Rl0, baseline=base,
)

# ---- wide-phase matvec costs (round 3): the step function issues ~10
# (B,n)@(n,m)-shaped products per iteration through mv/rmv; on TPU the
# f64 einsum is emulated.  Candidate replacement: the same Ozaki grouped
# bf16 GEMM machinery used for the normal-matrix formation. ----
from pycllp_tpu.ops.df64 import _ozaki_matmul, _ozaki_prepare, ozaki_params  # noqa: E402

N = A.shape[1]
x0 = jnp.asarray(rng.standard_normal((B, N)), jnp.float64)
y0 = jnp.asarray(rng.standard_normal((B, M)), jnp.float64)
A32 = A.astype(jnp.float32)
x32 = x0.astype(jnp.float32)

timed("f32 mv (einsum bn,mn->bm)", lambda a_, x_: jnp.einsum("bn,mn->bm", x_, a_)[0, 0], A32, x32, baseline=base)
timed("f64 mv emulated", lambda x_: jnp.einsum("bn,mn->bm", x_, A)[0, 0], x0, baseline=base)
timed("f64 rmv emulated", lambda y_: jnp.einsum("bm,mn->bn", y_, A)[0, 0], y0, baseline=base)

s_n, k_n, cut_n = ozaki_params(N)
Ag = _ozaki_prepare(A, s=s_n, n_slices=k_n, cut=cut_n)
def oz_mv(x_):
    return _ozaki_matmul(Ag[0], Ag[1], x_.T, s=s_n, n_slices=k_n, cut=cut_n)[0, 0]
timed(f"ozaki mv (s={s_n}, {cut_n-1} group GEMMs)", oz_mv, x0, baseline=base)

s_m, k_m, cut_m = ozaki_params(M)
ATg = _ozaki_prepare(A.T, s=s_m, n_slices=k_m, cut=cut_m)
def oz_rmv(y_):
    return _ozaki_matmul(ATg[0], ATg[1], y_.T, s=s_m, n_slices=k_m, cut=cut_m)[0, 0]
timed(f"ozaki rmv (s={s_m}, {cut_m-1} group GEMMs)", oz_rmv, y0, baseline=base)

# accuracy of the ozaki mv vs the emulated-f64 einsum
mv_oz = np.asarray(_ozaki_matmul(Ag[0], Ag[1], x0.T, s=s_n, n_slices=k_n, cut=cut_n)).T
mv_f64 = np.asarray(jnp.einsum("bn,mn->bm", x0, A))
rel = np.max(np.abs(mv_oz - mv_f64)) / np.max(np.abs(mv_f64))
log(f"ozaki mv vs f64 einsum: rel {rel:.2e}")

# elementwise f64-emulated cost probe (the step has ~30 O(nB) elementwise ops)
timed("f64 elementwise x*z+x (B,n)", lambda x_: (x_ * x_ + x_)[0, 0], x0, baseline=base)

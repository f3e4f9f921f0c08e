"""Double-single ("df64") Pallas kernels: ~48-bit factorizations on the VPU.

The finish-phase engine behind the 1e-6 correctness contract (upstream
contract: pycllp's default 1e-6 relative optimality tolerance on its
test LP set; reference mount empty this build — SURVEY.md §0,
BASELINE.md "Correctness" row).

Why this exists — measured on this chip (experiments/exp_finish_debug2,
2026-08-19):

* a pure-f64 IPM meets the contract (max 9.3e-7 vs scipy) but XLA's
  emulated f64 matmul runs ~65x slower than f32 — a straight f64 finish
  erases the batched-throughput win;
* the f32-factor + f64-iterative-refinement design (ops/mixed.py)
  CANNOT reach 1e-6: the f32 factor needs a PSD-safety shift
  δ_lo ≈ 2e-6·max(diag), the late-IPM normal matrix has λ_min ≪ δ_lo,
  and stationary IR's contraction ‖I − P⁻¹M̂‖ ≈ δ_lo/(λ_min+δ_lo) → 1;
  measured floor 3.1e-4 — two decades short.

The TPU-native fix: carry every number as an UNEVALUATED SUM of two
f32s (Dekker/Knuth "double-single", ~49-bit effective mantissa) and run
the batch-lane Cholesky and triangular substitutions directly in that
arithmetic on the VPU.  The f32 batch-lane kernels are latency-bound at
a few % of VPU throughput (docs/PERFORMANCE.md "Cholesky kernel
variants"), so the ~18x arithmetic of df64 costs far less than 18x
wall-clock — and no MXU/f64-emulation is involved at all.

Precision budget: u_df ≈ 2⁻⁴⁹ ≈ 1.8e-15, vs f64's 1.1e-16 — an 8x
coarser unit, plenty below the 1e-6 contract with the usual
cond(M+δI) ≲ 1/δ_rel = 1e12 late-IPM conditioning.

Algorithms are the classic error-free transformations (Dekker 1971,
Knuth TAOCP v2) as packaged in the QD/ddfun libraries; f32 split factor
2¹²+1 (24-bit mantissa → 12+12).  Correctness relies only on IEEE f32
+,−,× with round-to-nearest, which the TPU VPU provides; compilers may
contract a·b−p into an FMA, which makes the product error EXACT rather
than Dekker-approximated — both are correct.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pycllp_tpu.ops.reference import KernelSet

__all__ = ["DoubleSingleKernels", "DF64_FINISH_KERNELS", "DF64_FASTFORM_KERNELS"]

LANES = 128
_SPLIT = 4097.0  # 2**12 + 1 for f32 Dekker splitting


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# error-free transformations on f32 arrays; a df64 value is a (hi, lo) tuple
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _fast_two_sum(a, b):
    """Requires |a| >= |b| (guaranteed at every call site below)."""
    s = a + b
    return s, b - (s - a)


def _two_prod(a, b):
    p = a * b
    ta = a * _SPLIT
    ahi = ta - (ta - a)
    alo = a - ahi
    tb = b * _SPLIT
    bhi = tb - (tb - b)
    blo = b - bhi
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    return _fast_two_sum(s, e + (x[1] + y[1]))


def df_sub(x, y):
    return df_add(x, (-y[0], -y[1]))


def df_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    return _fast_two_sum(p, e + (x[0] * y[1] + x[1] * y[0]))


def df_div(x, y):
    """Two-correction division (full df64 accuracy)."""
    q1 = x[0] / y[0]
    r = df_sub(x, df_mul((q1, jnp.zeros_like(q1)), y))
    q2 = r[0] / y[0]
    r2 = df_sub(r, df_mul((q2, jnp.zeros_like(q2)), y))
    q3 = r2[0] / y[0]
    s, e = _fast_two_sum(q1, q2)
    return _fast_two_sum(s, e + q3)


def df_sqrt(x):
    """Karp's trick: f32 estimate + one df-corrected Newton step."""
    s1 = jnp.sqrt(x[0])
    z = jnp.zeros_like(s1)
    r = df_sub(x, df_mul((s1, z), (s1, z)))
    return _fast_two_sum(s1, r[0] / (2.0 * s1))


def _df_where(pred, x, y):
    return jnp.where(pred, x[0], y[0]), jnp.where(pred, x[1], y[1])


# ---------------------------------------------------------------------------
# kernel bodies (batch-last: instances on the lane axis, as ops/batchlast)
# ---------------------------------------------------------------------------


def _df_chol_kernel(mh_ref, ml_ref, reg_ref, lh_ref, ll_ref, dh_ref, dl_ref, *, m: int):
    """In-place df64 batch-lane Cholesky of the (m, m, LANES) hi/lo pair.

    Same right-looking column sweep as the f32 kernel
    (ops/batchlast._chol_body) — row access only — with every operation
    in double-single arithmetic.  δ (per-lane f32 ``reg``) is added at
    each diagonal's single read; non-PSD lanes turn NaN and are caught
    by the solver's numerical guard.
    """
    lh_ref[:] = mh_ref[:]
    ll_ref[:] = ml_ref[:]
    reg = reg_ref[0, :]
    zreg = jnp.zeros_like(reg)
    nan = jnp.asarray(jnp.nan, lh_ref.dtype)
    one = jnp.ones_like(reg)
    for k in range(m):
        akk = df_add((lh_ref[k, k, :], ll_ref[k, k, :]), (reg, zreg))
        pos = akk[0] > 0
        akk = _df_where(pos, akk, (one, zreg))
        sq = df_sqrt(akk)
        inv = df_div((one, zreg), sq)
        lh_ref[k, k, :] = jnp.where(pos, sq[0], nan)
        ll_ref[k, k, :] = jnp.where(pos, sq[1], 0.0)
        dh_ref[k, :] = jnp.where(pos, inv[0], nan)
        dl_ref[k, :] = jnp.where(pos, inv[1], 0.0)
        if k + 1 < m:
            col = df_mul(
                (lh_ref[k + 1 :, k, :], ll_ref[k + 1 :, k, :]),
                (inv[0][None, :], inv[1][None, :]),
            )
            lh_ref[k + 1 :, k, :] = col[0]
            ll_ref[k + 1 :, k, :] = col[1]
            upd = df_mul(
                (col[0][:, None, :], col[1][:, None, :]),
                (col[0][None, :, :], col[1][None, :, :]),
            )
            tr = df_sub((lh_ref[k + 1 :, k + 1 :, :], ll_ref[k + 1 :, k + 1 :, :]), upd)
            lh_ref[k + 1 :, k + 1 :, :] = tr[0]
            ll_ref[k + 1 :, k + 1 :, :] = tr[1]


def _df_row_mask(i: int, m: int, dtype):
    """(1, m, 1) compile-time-constant mask selecting columns < i."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    return (col < i).astype(dtype)


def _df_tree_sum_cols(hi, lo):
    """df64 sum over axis 1 of a (k, p, LANES) pair, any p ≥ 1.

    Pairwise tree over the largest power-of-two prefix (halving slices
    stay exactly aligned — a naive odd-width halving broadcasts 1-vs-2
    and double-counts), then recurse on the remainder and fold it in.
    """
    p = hi.shape[1]
    p2 = 1 << (p.bit_length() - 1)  # largest power of two <= p
    h, l = hi[:, :p2], lo[:, :p2]
    while h.shape[1] > 1:
        q = h.shape[1] // 2
        h, l = df_add((h[:, :q], l[:, :q]), (h[:, q:], l[:, q:]))
    acc = (h[:, 0], l[:, 0])
    if p > p2:
        acc = df_add(acc, _df_tree_sum_cols(hi[:, p2:], lo[:, p2:]))
    return acc


def _df_solve_kernel(
    lh_ref, ll_ref, dh_ref, dl_ref, rh_ref, rl_ref, vh_ref, vl_ref, *, m: int, k_rhs: int
):
    """Solve L Lᵀ v = r in df64 for k_rhs stacked RHS, batch-lane layout.

    Row access only (column slices of an (m, m, LANES) block sublane-
    gather ~20x slower — docs/PERFORMANCE.md): the forward pass is
    left-looking with the dot against row ``L[i, :i]`` done as a MASKED
    full-width df64 product + pairwise tree reduction — the mask is a
    compile-time constant per row, so every row has identical shapes
    (a triangular-sliced variant generated per-row-shaped code whose
    compile payload exceeded the remote-compile tunnel's request limit);
    the backward pass is right-looking with row updates, no reductions.
    """
    vh_ref[:] = rh_ref[:]
    vl_ref[:] = rl_ref[:]
    # forward: w[i] = (r[i] − L[i,:i]·w[:i]) · dinv[i]
    for i in range(m):
        di = (dh_ref[i, :][None, :], dl_ref[i, :][None, :])
        wi = (vh_ref[:, i, :], vl_ref[:, i, :])
        if i > 0:
            mask = _df_row_mask(i, m, lh_ref.dtype)
            row = (lh_ref[i, :, :][None, :, :] * mask, ll_ref[i, :, :][None, :, :] * mask)
            terms = df_mul(row, (vh_ref[:], vl_ref[:]))
            acc = _df_tree_sum_cols(*terms)
            wi = df_sub(wi, acc)
        wi = df_mul(wi, di)
        vh_ref[:, i, :] = wi[0]
        vl_ref[:, i, :] = wi[1]
    # backward: v[i] = w[i]·dinv[i]; w[:i] −= L[i,:i]·v[i]
    for i in reversed(range(m)):
        di = (dh_ref[i, :][None, :], dl_ref[i, :][None, :])
        vi = df_mul((vh_ref[:, i, :], vl_ref[:, i, :]), di)
        vh_ref[:, i, :] = vi[0]
        vl_ref[:, i, :] = vi[1]
        if i > 0:
            row = (lh_ref[i, :i, :][None, :, :], ll_ref[i, :i, :][None, :, :])
            upd = df_mul(row, (vi[0][:, None, :], vi[1][:, None, :]))
            tr = df_sub((vh_ref[:, :i, :], vl_ref[:, :i, :]), upd)
            vh_ref[:, :i, :] = tr[0]
            vl_ref[:, :i, :] = tr[1]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _z(i):
    return i - i  # x64-safe index-map zero (see ops/batchlast._z)


def _df_specs(m, k_rhs=None):
    l_spec = pl.BlockSpec((m, m, LANES), lambda i: (_z(i), _z(i), i), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((m, LANES), lambda i: (_z(i), i), memory_space=pltpu.VMEM)
    reg_spec = pl.BlockSpec((1, LANES), lambda i: (_z(i), i), memory_space=pltpu.VMEM)
    rhs_spec = None
    if k_rhs is not None:
        rhs_spec = pl.BlockSpec(
            (k_rhs, m, LANES), lambda i: (_z(i), _z(i), i), memory_space=pltpu.VMEM
        )
    return l_spec, d_spec, reg_spec, rhs_spec


@functools.partial(jax.jit, static_argnames=("m",))
def _df_chol_bl(Mh, Ml, reg, *, m: int):
    """(m, m, B) hi/lo + (B,) reg → (L_hi, L_lo, dinv_hi, dinv_lo)."""
    B = Mh.shape[-1]
    l_spec, d_spec, reg_spec, _ = _df_specs(m)
    return pl.pallas_call(
        functools.partial(_df_chol_kernel, m=m),
        grid=(B // LANES,),
        in_specs=[l_spec, l_spec, reg_spec],
        out_specs=[l_spec, l_spec, d_spec, d_spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, m, B), jnp.float32),
            jax.ShapeDtypeStruct((m, m, B), jnp.float32),
            jax.ShapeDtypeStruct((m, B), jnp.float32),
            jax.ShapeDtypeStruct((m, B), jnp.float32),
        ],
        input_output_aliases={0: 0, 1: 1},
        interpret=_interpret(),
        # the hi/lo pairs double the block windows of the f32 kernel:
        # 4 x (m, m, LANES) double-buffered busts Mosaic's default 16MB
        # scoped-vmem budget at m=64 (measured: over by 128K); v5e has
        # physical headroom above the default, so raise the cap.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=12 * (m**3) * B,  # ~36 f32 ops per df mul-add pair
            bytes_accessed=4 * m * m * B * 4,
            transcendentals=m * B,
        ),
    )(Mh, Ml, reg[None, :])


@functools.partial(jax.jit, static_argnames=("m", "k_rhs"))
def _df_solve_bl(Lh, Ll, Dh, Dl, Rh, Rl, *, m: int, k_rhs: int):
    B = Lh.shape[-1]
    l_spec, d_spec, _, rhs_spec = _df_specs(m, k_rhs)
    return pl.pallas_call(
        functools.partial(_df_solve_kernel, m=m, k_rhs=k_rhs),
        grid=(B // LANES,),
        in_specs=[l_spec, l_spec, d_spec, d_spec, rhs_spec, rhs_spec],
        out_specs=[rhs_spec, rhs_spec],
        out_shape=[
            jax.ShapeDtypeStruct((k_rhs, m, B), jnp.float32),
            jax.ShapeDtypeStruct((k_rhs, m, B), jnp.float32),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=40 * k_rhs * m * m * B,
            bytes_accessed=(2 * m * m * B + 4 * k_rhs * m * B) * 4,
            transcendentals=0,
        ),
    )(Lh, Ll, Dh, Dl, Rh, Rl)


def _pad_lanes(arr, B):
    Bp = -(-B // LANES) * LANES
    if Bp == B:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, Bp - B)]
    return jnp.pad(arr, pad, constant_values=1.0)


def _split_hi_lo(x64):
    """f64 array → (hi, lo) f32 pair with hi + lo == x64 to ~2⁻⁴⁸."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(x64.dtype)).astype(jnp.float32)
    return hi, lo


# ---------------------------------------------------------------------------
# Ozaki-scheme exact GEMM: ~2⁻⁴⁹-accurate W @ dᵀ from bf16 MXU passes
# ---------------------------------------------------------------------------
#
# XLA's emulated-f64 GEMM costs 98 ms for the 16K-lane 64² normal-matrix
# formation (measured, experiments/exp_df64_single.py) — the single
# largest wide-phase cost.  The Ozaki splitting (Ozaki et al. 2012)
# replaces it with a handful of NATIVE bf16 MXU GEMMs whose f32
# accumulations are EXACT, plus one fused f64 combine.
#
# ROUND-3 ROOT-CAUSE NOTE (VERDICT.md r2 item 1): the round-2 version
# sliced the f64 operands with a Veltkamp shift 1.5·e·2^(52−k·s) — an
# IEEE-binary64 bit trick.  TPU f64 is EMULATED as an f32 pair
# (double-double), where (R+σ)−σ does not round to a uniform quantum,
# so every slice was garbage ON THE TARGET HARDWARE while the CPU test
# suite (true f64) stayed green.  This rewrite uses NOTHING but IEEE
# f32 arithmetic — identical semantics on TPU VPU and CPU — so the CPU
# suite now genuinely covers the chip's slicing behavior:
#
# * each operand is normalized IN F64 by its per-row (W) / per-column
#   (dᵀ) max (late-IPM d spans beyond f32 range — an f32-first split
#   turns those columns into inf), split to an f32 (hi, lo) pair, and
#   sliced into ``n_slices`` INTEGER-valued s-bit bands via f32
#   Veltkamp shifts 1.5·2^(23−s·k); slice k holds ints ≤ 2^s — exact
#   in bf16 — and the running remainder is carried as an f32 pair, so
#   the bands capture ~s·n_slices ≥ 56 bits of the normalized value;
# * slice pairs (k, l) are grouped by total level t = k+l; within a
#   group all products share the EXACT quantum e_row·e_col·2^(−s·t), so
#   the group's pairs are concatenated along the contraction axis into
#   ONE bf16→f32 MXU GEMM: integer products ≤ 2^(2s) with ≤ n·g terms
#   keeps every partial sum < 2²⁴ — exactly representable in the f32
#   accumulator (the s/n_slices choice below enforces this bound);
# * the cut−1 group results are combined in one fused f64 pass with the
#   e_row ⊗ e_col outer scale.  Dropped pairs (t > cut) contribute
#   ≤ 2^(−s·(cut−1)) of the output scale — below the df64 unit.
#
# Compile payload: cut−1 (= 7 at s=7) GEMMs total.  The round-2 version
# unrolled 34, which (×3 wide-phase instantiations) was the single
# largest contributor to the 244 s bench compile that timed out the
# round-2 driver run.

OZAKI_S = 7  # max bits per slice
OZAKI_BITS = 66  # captured width per operand.  Sizing argument: the
# Ozaki truncation error is ABSOLUTE — ≈ n·2^(−bits)·(row scale ×
# column scale) — unlike the f64 einsum's entrywise-relative
# (Cauchy–Schwarz-class) error, and the normal-equations solve
# amplifies it by cond(M+δI) ≈ 1/reg_eps = 1e12.  Direction error
# ≈ n·2^(−bits)·1e12 must sit at ~1e-7 for the 1e-6 polish:
# 56 bits → 6e-4 (measured as a ρ_p floor of exactly that size —
# the wide phase DIVERGED); 66 bits → 1e-7.


OZAKI_MV_BITS = 48  # capture width for the MATVEC (Amv/Armv) paths.
# The formation feeding the Cholesky needs 66 bits (the solve amplifies
# its ABSOLUTE error by cond ≈ 1e12 — see the OZAKI_BITS sizing note).
# The matvec consumers are different: iterative-refinement residuals and
# the crossover's 1e-9-bound verification, where the absolute error
# n·2^(−bits)·rowscale·colscale ≈ 1e-12·scale at 48 bits sits 3+ decades
# under the bound.  Fewer bits = fewer slicing rounds AND fewer group
# GEMMs — the slicing is ~95% of the measured matvec cost (2026-08-21).


def ozaki_mv_params(n: int):
    """(s, n_slices, cut) for the matvec paths (``OZAKI_MV_BITS`` wide)."""
    import os

    return ozaki_params(n, int(os.environ.get("PYCLLP_OZAKI_MV_BITS", OZAKI_MV_BITS)))


def ozaki_params(n: int, bits: int | None = None):
    """(s, n_slices, cut) for contraction length ``n``.

    Exactness constraint: a group GEMM accumulates ≤ n·n_slices integer
    products of magnitude ≤ 2^(2s); every partial sum is an integer that
    must stay ≤ 2²⁴ (inclusive — 2²⁴ itself is f32-exact).  Pick the
    largest s satisfying it (fewer slices → fewer GEMMs), with
    n_slices = ceil(bits/s).  ``PYCLLP_OZAKI_BITS`` overrides the
    default width (accuracy/cost experiments).
    """
    import os

    if bits is None:
        bits = int(os.environ.get("PYCLLP_OZAKI_BITS", OZAKI_BITS))
    for s in range(OZAKI_S, 2, -1):
        n_slices = -(-bits // s)
        if n * n_slices * (1 << (2 * s)) <= (1 << 24):
            return s, n_slices, n_slices + 1
    raise ValueError(f"contraction length {n} too large for exact Ozaki slicing")


def _df_slice_int(X64, axis, *, s, n_slices):
    """Slice f64 ``X64`` into integer-valued s-bit f32 bands along ``axis``.

    Returns ``(slices, mx)``: per-``axis`` scale ``mx`` (f64, an exact
    power of two) and a list of ``n_slices`` f32 arrays with integer
    entries in [−2^s, 2^s] such that
    X64 ≈ mx · Σ_k slices[k] · 2^(−s·k)  to ~2^(−s·n_slices) relative
    to ``mx``.

    The normalization happens IN F64, before any f32 cast: the late-IPM
    scaling d = x/z spans beyond f32 range on genuine-f64 backends
    (measured 5e47 on the CPU oracle), and an f32-first split turns
    those columns into inf — NaN-ing every lane's wide phase.

    Round-4 cost rewrite: this function IS the Ozaki matvec's cost on
    the chip (measured 2026-08-21: 4.67 of 4.94 ms per 16K-lane mv —
    the bf16 group GEMMs are nearly free), and the old per-element
    emulated-f64 DIVIDE ``X64 / mx`` was its single largest term
    (software f64 division ≈ 4x an emulated multiply).  The scale is
    now rounded UP to a power of two, making the normalization an
    EXACT emulated multiply — which also removes the old combine-side
    2^-48 scale rounding entirely.  ``|R| ≤ 1`` still holds (mx2 ≥ mx).
    """
    mx = jnp.max(jnp.abs(X64), axis=axis, keepdims=True)
    mx = jnp.maximum(mx, jnp.asarray(jnp.finfo(jnp.float32).tiny, X64.dtype))
    # E = ceil(log2(mx)) on the small reduced array; an off-by-one from
    # log2 rounding at exact powers of two only halves/doubles the
    # normalized magnitude — the slice math is scale-invariant.
    E = jnp.ceil(jnp.log2(mx))
    mx = jnp.exp2(E)  # exact power of two
    Rh, Rl = _split_hi_lo(X64 * jnp.exp2(-E))  # exact scaling; |R| ≤ 1
    if X64.ndim == 2 and axis == 0:
        # the hot path (vector operands of every wide matvec/formation):
        # all rounds in one Pallas pass — see _slice_rounds_kernel
        return _slice_rounds_bl(Rh, Rl, s=s, n_slices=n_slices), mx
    slices = []
    for k in range(1, n_slices + 1):
        # Quantize via jnp.round, NOT the classic Veltkamp (R+σ)−σ:
        # under jit, XLA's algebraic simplifier CANCELS (x+σ)−σ → x for
        # constant σ (verified on CPU, minimal repro in the round-3
        # log), silently deleting the quantization on every backend —
        # the actual root cause of the round-2 on-chip wide-phase
        # breakage (bf16-rounded unquantized slices).  Pow2 scaling is
        # exact; round-to-nearest-even at the 2^(−s·k) quantum is a
        # real hardware op the simplifier cannot fold away.
        Ik = jnp.round(Rh * jnp.float32(2.0 ** (s * k)))  # integer-valued
        slices.append(Ik)
        Xk = Ik * jnp.float32(2.0 ** (-s * k))
        Rh, Rl = df_sub((Rh, Rl), (Xk, jnp.zeros_like(Xk)))
    return slices, mx


def _gemm_dtype():
    # TPU MXU accumulates bf16×bf16 in f32 (exact for our integers); CPU
    # backends accumulate bf16 dots IN bf16 (measured — destroys the
    # exactness), so off-TPU the integer slices run as f32 (also exact).
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _slice_rounds_kernel(rh_ref, rl_ref, *out_refs, s: int, n_slices: int):
    """All slicing rounds in ONE kernel pass, remainder in registers.

    The XLA version of the round loop materialises every intermediate
    (the retained slice outputs break elementwise fusion), so its cost
    is HBM traffic, not arithmetic: measured 4.0–4.7 ms per 16K-lane
    slicing on v5e — ~95% of each wide matvec — and almost independent
    of the round count.  Here the (Rh, Rl) remainder never leaves
    VMEM/registers; traffic is one read of the pair + one bf16 write
    per slice.
    """
    h = rh_ref[:]
    l = rl_ref[:]
    dt = out_refs[0].dtype
    for k in range(1, n_slices + 1):
        Ik = jnp.round(h * jnp.float32(2.0 ** (s * k)))
        out_refs[k - 1][:] = Ik.astype(dt)
        Xk = Ik * jnp.float32(2.0 ** (-s * k))
        h, l = df_sub((h, l), (Xk, jnp.zeros_like(Xk)))


@functools.partial(jax.jit, static_argnames=("s", "n_slices"))
def _slice_rounds_bl(Rh, Rl, *, s: int, n_slices: int):
    """(r, B) normalized hi/lo pair → n_slices integer bands (GEMM dtype)."""
    r, B = Rh.shape
    Bp = -(-B // LANES) * LANES
    if Bp != B:
        Rh = jnp.pad(Rh, ((0, 0), (0, Bp - B)))
        Rl = jnp.pad(Rl, ((0, 0), (0, Bp - B)))
    spec = pl.BlockSpec((r, LANES), lambda i: (_z(i), i), memory_space=pltpu.VMEM)
    gt = _gemm_dtype()
    outs = pl.pallas_call(
        functools.partial(_slice_rounds_kernel, s=s, n_slices=n_slices),
        grid=(Bp // LANES,),
        in_specs=[spec, spec],
        out_specs=[spec] * n_slices,
        out_shape=[jax.ShapeDtypeStruct((r, Bp), gt)] * n_slices,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=15 * n_slices * r * Bp,
            bytes_accessed=(8 + 2 * n_slices) * r * Bp,
            transcendentals=0,
        ),
    )(Rh, Rl)
    if Bp != B:
        outs = [o[:, :B] for o in outs]
    return list(outs)


def _ozaki_prepare(W64, *, s, n_slices, cut):
    """Precompute per-group concatenated slice blocks of ``W`` (m², n).

    Group t's block stacks slices [max(1, t−n_slices) … t−1] along the
    contraction axis (the order the d-side group concatenation mirrors,
    reversed).  Returns (tuple of per-group blocks, per-row scale).
    """
    sl, e = _df_slice_int(jnp.asarray(W64, jnp.float64), axis=1, s=s, n_slices=n_slices)
    gt = _gemm_dtype()
    groups = []
    for t in range(2, cut + 1):
        ks = range(max(1, t - n_slices), min(n_slices, t - 1) + 1)
        groups.append(jnp.concatenate([sl[k - 1] for k in ks], axis=1).astype(gt))
    return tuple(groups), e


def _ozaki_matmul(W_groups, We, d64, *, s, n_slices, cut):
    """~2^(−s·(cut−1))-accurate ``W @ d64`` from exact bf16 MXU GEMMs.

    ``W_groups``/``We``: from :func:`_ozaki_prepare`.  ``d64``: (n, B)
    f64, sliced here along axis 0.  Returns f64 (m², B).
    """
    dsl, de = _df_slice_int(jnp.asarray(d64, jnp.float64), axis=0, s=s, n_slices=n_slices)
    gt = _gemm_dtype()
    acc = None
    for t, Wg in zip(range(2, cut + 1), W_groups):
        ks = range(max(1, t - n_slices), min(n_slices, t - 1) + 1)
        Dg = jnp.concatenate([dsl[t - k - 1] for k in ks], axis=0).astype(gt)
        G = jnp.dot(Wg, Dg, preferred_element_type=jnp.float32)
        term = G.astype(jnp.float64) * (2.0 ** (-s * t))
        acc = term if acc is None else acc + term
    return acc * (We.astype(jnp.float64) * de.astype(jnp.float64))


# ---------------------------------------------------------------------------
# KernelSet implementation (f64 public interface)
# ---------------------------------------------------------------------------


class PreparedDF(typing.NamedTuple):
    A: typing.Any  # (m, n) or (B, m, n) f64
    Asq: typing.Any
    W: typing.Any  # (m², n) f64 self-outer-product, or None for 3-D A
    Wh: typing.Any  # f32 hi/lo split of W (fast-formation GEMM inputs)
    Wl: typing.Any
    Woz: typing.Any  # (per-group integer slice blocks, e_row) or None
    Amv: typing.Any  # Ozaki slice groups of A — exact-GEMM f64 matvecs
    Armv: typing.Any  # ... and of Aᵀ (different contraction length!)
    # NOTE: the static (s, n_slices, cut) are re-derived from A.shape via
    # ozaki_params() wherever needed — shapes are static under jit.


class DFFactor(typing.NamedTuple):
    ctx: PreparedDF
    Lh: typing.Any
    Ll: typing.Any
    dinv_h: typing.Any
    dinv_l: typing.Any
    d: typing.Any
    reg: typing.Any


class DoubleSingleKernels(KernelSet):
    """f64-interface kernel set whose O(m³) work runs in df64 Pallas.

    Used as the finish-phase sibling of the f32 batch-last kernels:
    matvecs/residuals stay f64 (elementwise-emulated, cheap at O(m·n)),
    the normal-matrix factorization and triangular solves run in
    double-single arithmetic on the VPU.  The normal matrix itself is
    formed by an XLA f64 einsum (O(m²·n·B), ~7 ms per 16K-lane 64²
    chunk on v5e) and split hi/lo for the kernel.
    """

    name = "pallas_df64"

    def __init__(self, form: str = "ozaki"):
        # How the (shared-A) normal matrix is formed:
        #   "f64"   XLA's emulated-f64 GEMM — 98 ms per 16K-lane 64²
        #           formation on v5e (measured 2026-08-19), ~2⁻⁴⁸
        #   "ozaki" 7 grouped EXACT bf16 MXU slice GEMMs + one fused
        #           f64 combine — ~2⁻⁴⁹ of the output scale at a small
        #           fraction of the f64 cost (round-3 TPU-exact rewrite;
        #           see the root-cause note above _pow2_above)
        #   "fast"  3 f32 GEMMs on hi/lo splits — f32-ACCUMULATION
        #           accuracy (~1e-6): measured UNUSABLE for the 1e-12
        #           shift (15.8K/16.4K lanes NUMERICAL); kept only as a
        #           recorded negative result
        assert form in ("ozaki", "f64", "fast")
        self.form = form
        if form != "ozaki":
            self.name = f"pallas_df64_{form}form"

    def prepare(self, A):
        A = jnp.asarray(A, jnp.float64)
        if A.ndim != 2:
            return PreparedDF(
                A=A, Asq=A * A, W=None, Wh=None, Wl=None, Woz=None,
                Amv=None, Armv=None,
            )
        m, n = A.shape
        W = (A[:, None, :] * A[None, :, :]).reshape(m * m, n)
        Wh, Wl = _split_hi_lo(W)
        Woz = None
        if self.form == "ozaki":
            s, n_slices, cut = ozaki_params(n)
            Woz = _ozaki_prepare(W, s=s, n_slices=n_slices, cut=cut)
        # Ozaki slice groups for the matvecs too: XLA's emulated-f64
        # GEMM runs ~65x slower than f32 on TPU, and the wide phase
        # makes ~8 matvec calls per crossover / IPM iteration — on the
        # 16K-lane bench chunks the f64 einsums dominated the whole
        # wide stage (measured 2026-08-20: ~1.1 s of a 1.3 s crossover
        # pass).  The same exact-bf16-GEMM scheme used for W@dᵀ applies
        # to A@xᵀ and Aᵀ@yᵀ directly, at the narrower matvec width
        # (``OZAKI_MV_BITS`` — see its sizing note).
        sm, nm, cm = ozaki_mv_params(n)
        sr, nr, cr = ozaki_mv_params(m)
        Amv = _ozaki_prepare(A, s=sm, n_slices=nm, cut=cm)
        Armv = _ozaki_prepare(A.T, s=sr, n_slices=nr, cut=cr)
        return PreparedDF(
            A=A, Asq=A * A, W=W, Wh=Wh, Wl=Wl, Woz=Woz, Amv=Amv, Armv=Armv
        )

    def mv(self, ctx, x):
        if getattr(ctx, "Amv", None) is None or x.ndim != 2:
            return jnp.einsum("...mn,...n->...m", ctx.A, x)
        n = ctx.A.shape[-1]
        s, n_slices, cut = ozaki_mv_params(n)
        return _ozaki_matmul(
            ctx.Amv[0], ctx.Amv[1], x.T, s=s, n_slices=n_slices, cut=cut
        ).T

    def rmv(self, ctx, y):
        if getattr(ctx, "Armv", None) is None or y.ndim != 2:
            return jnp.einsum("...mn,...m->...n", ctx.A, y)
        m = ctx.A.shape[-2]
        s, n_slices, cut = ozaki_mv_params(m)
        return _ozaki_matmul(
            ctx.Armv[0], ctx.Armv[1], y.T, s=s, n_slices=n_slices, cut=cut
        ).T

    def factor(self, ctx, d, reg_eps):
        if not isinstance(ctx, PreparedDF):
            ctx = self.prepare(ctx.A)
        d = d.astype(jnp.float64)
        m = ctx.A.shape[-2]
        B = d.shape[0]
        # reg needs only max(diag(ADAᵀ)) to ~% accuracy — not worth an
        # emulated-f64 GEMM.  d spans beyond f32 range (measured 5e47),
        # so normalize per lane IN F64 first, run one f32 GEMM, and
        # rescale: reg = reg_eps · max_j Σ_n A²[j,n]·d[n].
        dmax = jnp.max(d, axis=-1)
        dmax_s = jnp.maximum(dmax, jnp.asarray(jnp.finfo(jnp.float64).tiny))
        ds = (d / dmax_s[..., None]).astype(jnp.float32)
        diag32 = jnp.einsum(
            "...mn,...n->...m", ctx.Asq.astype(jnp.float32), ds
        )
        reg = reg_eps * jnp.max(diag32, axis=-1).astype(jnp.float64) * dmax_s
        if ctx.W is None:
            M = jnp.einsum("bmn,bn,bkn->mkb", ctx.A, d, ctx.A)
            Mh, Ml = _split_hi_lo(_pad_lanes(M, B))
        elif self.form == "ozaki":
            s, n_slices, cut = ozaki_params(ctx.A.shape[-1])
            M = _ozaki_matmul(
                ctx.Woz[0], ctx.Woz[1], d.T, s=s, n_slices=n_slices, cut=cut
            ).reshape(m, m, -1)
            Mh, Ml = _split_hi_lo(_pad_lanes(M, B))
        elif self.form == "fast":
            dh, dl = _split_hi_lo(d.T)
            P = ctx.Wh @ dh  # f32 MXU (highest-precision passes)
            Q = ctx.Wh @ dl + ctx.Wl @ dh
            Mh, Ml = _split_hi_lo(
                _pad_lanes(
                    (P.astype(jnp.float64) + Q.astype(jnp.float64)).reshape(m, m, -1),
                    B,
                )
            )
        else:
            M = (ctx.W @ d.T).reshape(m, m, -1)  # batch-last directly
            Mh, Ml = _split_hi_lo(_pad_lanes(M, B))
        regp = _pad_lanes(reg.astype(jnp.float32), B)
        Lh, Ll, Dh, Dl = _df_chol_bl(Mh, Ml, regp, m=m)
        return DFFactor(ctx=ctx, Lh=Lh, Ll=Ll, dinv_h=Dh, dinv_l=Dl, d=d, reg=reg)

    def solve(self, fac, rs):
        m = fac.Lh.shape[0]
        B = rs[0].shape[0]
        R = jnp.stack([r.T for r in rs], axis=0)  # (k, m, B) f64
        Rh, Rl = _split_hi_lo(_pad_lanes(R, B))
        Vh, Vl = _df_solve_bl(
            fac.Lh, fac.Ll, fac.dinv_h, fac.dinv_l, Rh, Rl, m=m, k_rhs=len(rs)
        )
        V = Vh.astype(jnp.float64) + Vl.astype(jnp.float64)
        return tuple(V[i, :, :B].T for i in range(len(rs)))


DF64_FINISH_KERNELS = DoubleSingleKernels()  # Ozaki formation (default)
DF64_F64FORM_KERNELS = DoubleSingleKernels(form="f64")
DF64_FASTFORM_KERNELS = DoubleSingleKernels(form="fast")

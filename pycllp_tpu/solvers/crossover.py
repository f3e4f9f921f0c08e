"""Vertex crossover finish: basis identification + ONE wide basis solve.

TPU-native redesign note (SURVEY.md §7 hard part 1; upstream parity:
the reference meets its 1e-6 contract by solving entirely in f64 on the
CPU — reference mount empty this build, SURVEY.md §0).  The f32 TPU
path reaches ~1e-4; continuing the IPM in emulated f64 costs 3–8 wide
iterations per lane, each with a df64 factorization (measured: the
contract-meeting IPM-finish configs run at ~11K LP/s, 0.11x the
BASELINE.md north star).  This module instead finishes a lane with ONE
wide factorization: the narrow interior point identifies the optimal
basis B (the m largest complementarity ratios x/z — by the time the
IPM reaches a ~1e-4 gap the basic/nonbasic partition of a nondegenerate
LP is settled), and the exact vertex is recovered from the basis normal
equations, reusing the df64 kernels unchanged with the 0/1 basis
indicator as the diagonal:

    M   = A·diag(e_B)·Aᵀ  =  B·Bᵀ      (existing formation kernel)
    x_B = Bᵀ M⁻¹ b                      (then  B x_B = b  exactly)
    y   = M⁻¹ B c_B                     (then  Bᵀ y  = c_B exactly)
    z   = c − Aᵀ y                      (z_B ≈ 0, z_N = reduced costs)

Conditioning: the solves are κ(B)²-conditioned; ``refine`` df64
iterative-refinement sweeps against the TRUE residuals (b − A x and
c_B − Bᵀy, computed in f64) remove both the κ² amplification and the
diagonal-regularization shift, leaving O(2⁻⁴⁸·κ) error — orders below
the 1e-6 contract.  Acceptance is verified per lane: finiteness, primal
residual, x ≥ 0 (primal vertex feasibility) and z ≥ 0 (dual
feasibility/optimality).  A rejected lane (wrong basis guess at the
switch point, singular B from a degenerate optimum) falls back to the
wide IPM continuation — crossover is an accelerator, never a
correctness gate.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["basis_indicator", "vertex_candidate", "crossover_candidate"]


def _top_m_indicator(score, m: int):
    """0/1 indicator of the m largest scores per lane.

    Sort-cutoff formulation, NOT top_k + scatter: the m-th largest value
    per lane is read from a row-wise sort (lane-parallel bitonic on
    TPU), strict winners take it directly, and ties at the cutoff are
    broken left-to-right by a cumsum — all vectorized compares.  The
    scatter variant (`zeros.at[lanes, topk_idx].set(1)`) measured
    80.6 ms per 16K-lane application on v5e vs 4.5 ms for this
    (experiments/exp_crossover_cost.py, 2026-08-20); at 3 attempts ×
    4 chunks the scatter was ~1 s of the crossover stage.

    The sort runs on an F32 VIEW of the scores: only the ORDERING
    matters for basis selection, a bitonic sort on emulated-f64 pairs
    costs ~2x the f32 one, and entries that collide at f32 resolution
    are exactly the degenerate near-ties whose selection was arbitrary
    in f64 too (and which the repair rounds own either way).  The
    cumsum tie-break makes the m-count exact under collisions.
    """
    n = score.shape[-1]
    if score.dtype == jnp.float64:
        # order-preserving clamp BEFORE the cast: f64 scores above f32
        # max (x/z ratios measured up to 5e47) would cast to +inf and be
        # indistinguishable from the repair rounds' +inf 'enter' pins
        # (ADVICE r4) — clamp finite scores strictly below the pin
        # sentinel, let genuine ±inf pins through.
        fmax = jnp.asarray(3.0e38, jnp.float64)
        s32 = jnp.where(
            jnp.isinf(score), score, jnp.clip(score, -fmax, fmax)
        ).astype(jnp.float32)
    else:
        s32 = score
    cut = jnp.sort(s32, axis=-1)[..., n - m][..., None]
    gt = s32 > cut
    need = m - jnp.sum(gt, axis=-1, keepdims=True)
    eq = s32 == cut
    take = eq & (jnp.cumsum(eq, axis=-1) <= need)
    return (gt | take).astype(score.dtype)


def basis_indicator(x, z, m: int):
    """0/1 indicator of the m largest complementarity ratios x/z per lane.

    At an optimal vertex the basic variables have x > 0 = z and the
    nonbasic ones x = 0 < z, so x/z separates the partition by many
    orders of magnitude once the interior point is near convergence.
    NaN ratios (numerically-broken lanes) sort last; those lanes fail
    the candidate verification downstream either way.
    """
    ratio = x / jnp.maximum(z, jnp.asarray(jnp.finfo(x.dtype).tiny, x.dtype))
    ratio = jnp.where(jnp.isnan(ratio), -jnp.inf, ratio)
    return _top_m_indicator(ratio, m)


def vertex_candidate(
    fctx,
    b,
    c,
    d,
    fkset,
    *,
    reg_eps: float = 1e-12,
    refine: int = 2,
    feas_tol: float = 1e-9,
):
    """Solve the basis normal equations for indicator ``d``; verify per lane.

    Returns ``(xv, yv, zv, ok)`` with xv/zv UNCLAMPED (the repair rounds
    read their signs); ``ok`` is the finiteness/residual/sign test.
    """
    fac = fkset.factor(fctx, d, reg_eps)
    w, yv = fkset.solve(fac, (b, fkset.mv(fctx, d * c)))
    xv = d * fkset.rmv(fctx, w)

    def refine_body(_, xy):
        xv, yv = xy
        rp = b - fkset.mv(fctx, xv)
        rd_b = d * (c - fkset.rmv(fctx, yv))
        dw, dy = fkset.solve(fac, (rp, fkset.mv(fctx, rd_b)))
        return xv + d * fkset.rmv(fctx, dw), yv + dy

    if refine:
        # fori_loop, not an unrolled Python loop: the sweep's solve +
        # 4 wide matvecs trace ONCE regardless of the sweep count — the
        # finish program's compile weight scales with traced df64/Ozaki
        # instances (docs/PERFORMANCE.md round 4), not executed sweeps.
        xv, yv = lax.fori_loop(0, refine, refine_body, (xv, yv))
    zv = c - fkset.rmv(fctx, yv)

    rp = b - fkset.mv(fctx, xv)
    one = jnp.asarray(1.0, xv.dtype)
    bscale = jnp.maximum(one, jnp.max(jnp.abs(b), axis=-1))
    xscale = jnp.maximum(one, jnp.max(xv, axis=-1))
    zscale = jnp.maximum(one, jnp.max(jnp.abs(zv), axis=-1))
    ok = (
        jnp.all(jnp.isfinite(xv), axis=-1)
        & jnp.all(jnp.isfinite(yv), axis=-1)
        & jnp.all(jnp.isfinite(zv), axis=-1)
        & (jnp.max(jnp.abs(rp), axis=-1) <= feas_tol * bscale)
        & (jnp.min(xv, axis=-1) >= -feas_tol * xscale)
        & (jnp.min(zv, axis=-1) >= -feas_tol * zscale)
    )
    return xv, yv, zv, ok, rp


def crossover_candidate(
    fctx,
    b,
    c,
    x,
    z,
    fkset,
    *,
    reg_eps: float = 1e-12,
    refine: int = 2,
    feas_tol: float = 1e-9,
    repair: int = 0,
):
    """Compute the vertex candidate and its per-lane acceptance mask.

    Parameters are in SCALED equality coordinates, wide dtype; ``x``/``z``
    are the de-embedded interior point (x/τ, z/τ).  Returns
    ``(xv, yv, zv, ok)`` with xv/zv clamped nonnegative; ``ok`` is the
    sign/residual verification only — the caller layers the ρ-indicator
    classification on top.

    ``repair``: batched basis-repair rounds for rejected lanes.  The
    measured reject anatomy (docs/PERFORMANCE.md round 3) is a basis
    guess off by 1–2 indices, and a wrong candidate names its own error:
    a basic variable with xv < 0 must leave, a nonbasic one with zv < 0
    (negative reduced cost) must enter.  Each round pins those scores to
    ∓∞ in the ratio ordering, re-selects the top-m basis, re-solves, and
    re-verifies — a fixed unrolled loop of cheap batched solves at full
    width, replacing the wide-IPM "sharpen" round (which paid df64
    factorizations per iteration on a gathered bucket).  Accepted lanes
    keep their first accepted candidate; score pins accumulate across
    rounds so repeated violations walk monotonically through the order.

    Returns ``(xv, yv, zv, ok, rp, rd)``.  ``rp``/``rd`` are the
    candidate's primal/dual residuals AS ALREADY COMPUTED during
    verification: rp is the final true residual of the accepted round,
    and rd = min(z_unclamped, 0) — z was constructed as exactly
    c − Aᵀy, so the only dual residual is the nonnegativity clamp's
    residue (≤ feas_tol·scale for accepted lanes).  The caller's
    ρ-indicator test reuses them instead of paying two more wide
    matvecs per crossover pass (measured: the Ozaki mv/rmv pair was
    ~15% of the full-width crossover stage).
    """
    m = b.shape[-1]
    tiny = jnp.asarray(jnp.finfo(x.dtype).tiny, x.dtype)
    score = x / jnp.maximum(z, tiny)
    score = jnp.where(jnp.isnan(score), -jnp.inf, score)
    d = _top_m_indicator(score, m)

    xv, yv, zv, ok, rp = vertex_candidate(
        fctx, b, c, d, fkset, reg_eps=reg_eps, refine=refine, feas_tol=feas_tol
    )
    xa, ya, za, acc, rpa = xv, yv, zv, ok, rp
    one = jnp.asarray(1.0, x.dtype)
    inf_ = jnp.asarray(jnp.inf, score.dtype)

    def repair_body(_, carry):
        score, d, xv, yv, zv, rp, xa, ya, za, acc, rpa = carry
        xscale = jnp.maximum(one, jnp.max(xv, axis=-1))[..., None]
        zscale = jnp.maximum(one, jnp.max(jnp.abs(zv), axis=-1))[..., None]
        leave = (d > 0.5) & (xv < -feas_tol * xscale)
        enter = (d < 0.5) & (zv < -feas_tol * zscale)
        score = jnp.where(leave, -inf_, jnp.where(enter, inf_, score))
        d = _top_m_indicator(score, m)
        xv, yv, zv, ok, rp = vertex_candidate(
            fctx, b, c, d, fkset, reg_eps=reg_eps, refine=refine, feas_tol=feas_tol
        )
        newly = ok & ~acc
        nn = newly[..., None]
        xa = jnp.where(nn, xv, xa)
        ya = jnp.where(nn, yv, ya)
        za = jnp.where(nn, zv, za)
        rpa = jnp.where(nn, rp, rpa)
        acc = acc | newly
        return score, d, xv, yv, zv, rp, xa, ya, za, acc, rpa

    if repair:
        # rounds as a fori_loop: one traced factor+solve instance for
        # ANY repair count (round 4 traced repair+1 full vertex solves
        # per crossover — 9 df64 instances across the drain tiers was
        # the finish program's dominant compile payload)
        _, _, _, _, _, _, xa, ya, za, acc, rpa = lax.fori_loop(
            0, repair, repair_body,
            (score, d, xv, yv, zv, rp, xa, ya, za, acc, rpa),
        )
    return (
        jnp.maximum(xa, 0.0),
        ya,
        jnp.maximum(za, 0.0),
        acc,
        rpa,
        jnp.minimum(za, 0.0),
    )

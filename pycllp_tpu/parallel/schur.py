"""Column-sharded HSD for LPs larger than one chip — batched.

The "model parallel" slot of SURVEY.md §2.3 (no upstream analogue):
variables (columns of A) partition across the mesh; each device holds
``A_loc (m, n/P)`` and the ``x/z/c`` shards, while ``y/b`` and the m×m
normal matrix are replicated.  A leading batch axis carries small
batches of big LPs (shared A, per-instance b/c — the big-LP sibling of
the scenario batch).  Per iteration:

* ``M_b = Σ_p A_p D_{b,p} A_pᵀ`` — local Gram matrices assembled with
  ONE ``psum`` over the model axis (the Schur-complement-style
  reduction of BASELINE.json's north star: the only collective in the
  hot loop, riding ICI);
* batched Cholesky + triangular solves run on the replicated (B, m, m)
  M on every device (m ≪ n: redundant compute is cheaper than sharding
  an m×m factor);
* matvecs ``A@x`` psum; ``Aᵀy`` is purely local; dot products and the
  ratio test reduce with psum/pmin.

Termination quantities are replicated by construction, so the
``while_loop`` predicate (any lane RUNNING) is consistent across
devices with no extra collective.  Per-lane status masking mirrors
:mod:`pycllp_tpu.solvers.hsd`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from pycllp_tpu.solvers.options import SolverOptions, Status

__all__ = ["column_sharded_hsd_solve", "model_mesh"]

_RUNNING = np.int32(int(Status.RUNNING))  # numpy scalar: no device init at import


def model_mesh(n_devices: int | None = None, axis: str = "model") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


class ColState(NamedTuple):
    x: jnp.ndarray  # (B, n_loc)
    y: jnp.ndarray  # (B, m) replicated
    z: jnp.ndarray  # (B, n_loc)
    tau: jnp.ndarray  # (B,)
    kappa: jnp.ndarray  # (B,)
    status: jnp.ndarray  # (B,) int32
    iterations: jnp.ndarray  # (B,) int32
    k: jnp.ndarray  # () int32


def column_sharded_hsd_solve(
    A,
    b,
    c,
    opts: SolverOptions = SolverOptions(),
    mesh: Mesh | None = None,
    factor: str = "replicated",
):
    """Solve a (batch of) equality-form LP(s) ``min cᵀx, Ax=b, x≥0``
    with columns sharded over the mesh.  ``n`` must divide by the mesh
    size (the registry ``schur`` solver pads automatically).

    ``b``/``c`` may be ``(m,)``/``(n,)`` (single LP) or ``(B, m)``/
    ``(B, n)``.  Returns dict(x, z, y, objective, status, iterations)
    with x/z column-sharded and the batch axis matching the input.

    ``factor`` selects the normal-matrix strategy:

    * ``"replicated"`` (default) — psum-assemble the full (B, m, m) M
      and Cholesky it redundantly on every device.  Right for m ≪ n:
      redundant O(m³) compute is cheaper than distributing it.
    * ``"sharded"`` — M's ROWS partition over the mesh and a
      distributed blocked Cholesky factors it in place
      (:mod:`pycllp_tpu.parallel.dchol`): per-device memory O(B·m²/P),
      trailing-update FLOPs sharded P ways, one all-gather per panel.
      The path for big-m LPs whose factor exceeds one chip.  Requires
      ``m`` divisible by the mesh size.
    """
    if mesh is None:
        mesh = model_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    m, n = A.shape
    if n % n_dev:
        raise ValueError(f"n={n} not divisible by mesh size {n_dev}")
    if factor not in ("replicated", "sharded"):
        raise ValueError(f"unknown factor strategy {factor!r}")
    if factor == "sharded" and m % n_dev:
        raise ValueError(f"factor='sharded' needs m={m} divisible by {n_dev}")

    dtype = jnp.dtype(opts.dtype) if opts.dtype else jnp.result_type(A, b, c)
    A = jnp.asarray(A, dtype)
    b = jnp.asarray(b, dtype)
    c = jnp.asarray(c, dtype)
    squeeze = b.ndim == 1
    if squeeze:
        b, c = b[None], c[None]
    n_total = n

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P(None, axis)),
        out_specs={
            "x": P(None, axis),
            "z": P(None, axis),
            "y": P(),
            "objective": P(),
            "status": P(),
            "iterations": P(),
        },
        check_vma=False,
    )
    def solve(A_l, b_r, c_l):
        B = b_r.shape[0]

        def psum(v):
            return lax.psum(v, axis)

        def pmin(v):
            return lax.pmin(v, axis)

        def mv(x_l):  # A @ x → (B, m) replicated
            return psum(jnp.einsum("bn,mn->bm", x_l, A_l))

        def rmv(y_r):  # Aᵀ y → local (B, n_loc) shard
            return jnp.einsum("bm,mn->bn", y_r, A_l)

        def pdot(u_l, v_l):  # (B,) replicated
            return psum(jnp.sum(u_l * v_l, axis=-1))

        reg_eps = opts.resolved_reg_eps(dtype)

        def residuals(s: ColState):
            rp = b_r * s.tau[:, None] - mv(s.x)
            rd = c_l * s.tau[:, None] - rmv(s.y) - s.z
            rg = pdot(c_l, s.x) - jnp.sum(b_r * s.y, axis=-1) + s.kappa
            mu = (pdot(s.x, s.z) + s.tau * s.kappa) / (n_total + 1)
            return rp, rd, rg, mu

        def dnorm(v_l):  # (B,) 2-norm of column-sharded vectors
            return jnp.sqrt(psum(jnp.sum(v_l * v_l, axis=-1)))

        x0 = jnp.ones_like(c_l)
        y0 = jnp.zeros_like(b_r)
        z0 = jnp.ones_like(c_l)
        ones = jnp.ones((B,), dtype)
        s0 = ColState(
            x0, y0, z0, ones, ones,
            jnp.full((B,), _RUNNING, jnp.int32),
            jnp.zeros((B,), jnp.int32), jnp.int32(0),
        )
        rp, rd, rg, mu = residuals(s0)
        rp0 = jnp.maximum(1.0, jnp.linalg.norm(rp, axis=-1))
        rd0 = jnp.maximum(1.0, dnorm(rd))
        rg0 = jnp.maximum(1.0, jnp.abs(rg))
        mu0 = mu

        def classify(s, rp, rd, rg, mu):
            by = jnp.sum(b_r * s.y, axis=-1)
            rho_p = jnp.linalg.norm(rp, axis=-1) / rp0
            rho_d = dnorm(rd) / rd0
            rho_g = jnp.abs(rg) / rg0
            rho_A = jnp.abs(rg - s.kappa) / (s.tau + jnp.abs(by))
            optimal = (rho_p <= opts.tol) & (rho_d <= opts.tol) & (rho_A <= opts.tol)
            inf1 = (
                (rho_p <= opts.tol)
                & (rho_d <= opts.tol)
                & (rho_g <= opts.tol)
                & (s.tau <= opts.tol * jnp.maximum(1.0, s.kappa))
            )
            inf2 = (mu / mu0 <= opts.tol) & (s.tau <= opts.tol * jnp.minimum(1.0, s.kappa))
            infs = jnp.where(
                by > opts.tol,
                jnp.int32(int(Status.INFEASIBLE)),
                jnp.int32(int(Status.UNBOUNDED)),
            )
            running = s.status == _RUNNING
            return jnp.where(
                running & optimal,
                jnp.int32(int(Status.OPTIMAL)),
                jnp.where(running & (inf1 | inf2), infs, s.status),
            )

        def max_step(x, dx, z, dz, tau, dtau, kappa, dkappa):
            big = jnp.asarray(jnp.finfo(dtype).max, dtype)

            def ratios(v, dv):
                r = jnp.where(dv < 0, v / jnp.where(dv < 0, -dv, 1.0), big)
                return jnp.min(r, axis=-1) if r.shape[-1] else jnp.full(r.shape[:-1], big, dtype)

            a = pmin(jnp.minimum(ratios(x, dx), ratios(z, dz)))
            a = jnp.minimum(a, jnp.where(dtau < 0, tau / jnp.where(dtau < 0, -dtau, 1.0), big))
            a = jnp.minimum(
                a, jnp.where(dkappa < 0, kappa / jnp.where(dkappa < 0, -dkappa, 1.0), big)
            )
            return a

        def cond(s):
            return (s.k < opts.maxiter) & jnp.any(s.status == _RUNNING)

        def body(s):
            rp, rd, rg, mu = residuals(s)
            status = classify(s, rp, rd, rg, mu)

            dinv = s.x / s.z  # (B, n_loc)
            if factor == "sharded":
                # row-sharded assembly (peak memory (B, m/P, m)/device)
                # + distributed blocked Cholesky (parallel/dchol.py)
                from pycllp_tpu.parallel.dchol import (
                    rowshard_cholesky,
                    rowshard_cholesky_solve,
                )

                my = lax.axis_index(axis)
                mb = m // n_dev
                cols = jnp.arange(m)
                # (mb, m) indicator of my diagonal positions
                emask = (cols[None, :] == (my * mb + jnp.arange(mb))[:, None]).astype(dtype)
                Mw = jnp.zeros((B, mb, m), dtype)
                for i in range(n_dev):
                    rows = slice(i * mb, (i + 1) * mb)
                    Gi = psum(jnp.einsum("in,bn,jn->bij", A_l[rows], dinv, A_l))
                    Mw = jnp.where(my == i, Gi, Mw)
                dloc = jnp.einsum("bam,am->ba", Mw, emask)  # my diag entries
                dmax = lax.pmax(jnp.max(dloc, axis=-1), axis)
                Mw = Mw + (reg_eps * dmax)[:, None, None] * emask[None]
                Lw, kks = rowshard_cholesky(Mw, axis, n_dev)

                def msolve(r):  # (B, m) replicated systems
                    return rowshard_cholesky_solve(Lw, kks, r, axis, n_dev)

            else:
                # the Schur/psum assembly: M_b = Σ_p A_p D_{b,p} A_pᵀ (replicated)
                M = psum(jnp.einsum("in,bn,jn->bij", A_l, dinv, A_l))
                diag_max = jnp.max(jnp.diagonal(M, axis1=-2, axis2=-1), axis=-1)
                M = M + (reg_eps * diag_max)[:, None, None] * jnp.eye(m, dtype=dtype)
                L = lax.linalg.cholesky(M)  # batched; big-m XLA path

                def msolve(r):  # (B, m) replicated systems
                    t = lax.linalg.triangular_solve(L, r[..., None], left_side=True, lower=True)
                    return lax.linalg.triangular_solve(
                        L, t, left_side=True, lower=True, transpose_a=True
                    )[..., 0]

            def sym_solve(r1_l, r2_r):
                v = msolve(r2_r + mv(dinv * r1_l))
                u = dinv * (rmv(v) - r1_l)
                return u, v

            p, q = sym_solve(c_l, b_r)
            denom = s.kappa / s.tau + jnp.sum(b_r * q, axis=-1) - pdot(c_l, p)

            def newton(eta, gmu, dxa, dza, dta, dka):
                rxs = gmu[:, None] - s.x * s.z - dxa * dza
                rtk = gmu - s.tau * s.kappa - dta * dka
                r1 = eta[:, None] * rd - rxs / s.x
                u, v = sym_solve(r1, eta[:, None] * rp)
                dtau = (
                    eta * rg + rtk / s.tau
                    - (jnp.sum(b_r * v, axis=-1) - pdot(c_l, u))
                ) / denom
                dx = u + p * dtau[:, None]
                dy = v + q * dtau[:, None]
                dz = (rxs - s.z * dx) / s.x
                dkappa = (rtk - s.kappa * dtau) / s.tau
                return dx, dy, dz, dtau, dkappa

            zero_l = jnp.zeros_like(s.x)
            zero = jnp.zeros((B,), dtype)
            one = jnp.ones((B,), dtype)
            dxa, dya, dza, dta, dka = newton(one, zero, zero_l, zero_l, zero, zero)
            a_aff = jnp.minimum(1.0, max_step(s.x, dxa, s.z, dza, s.tau, dta, s.kappa, dka))
            aan = a_aff[:, None]
            mu_aff = (
                pdot(s.x + aan * dxa, s.z + aan * dza)
                + (s.tau + a_aff * dta) * (s.kappa + a_aff * dka)
            ) / (n_total + 1)
            gamma = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)
            dx, dy, dz, dtau, dkappa = newton(1.0 - gamma, gamma * mu, dxa, dza, dta, dka)
            alpha = jnp.minimum(
                1.0, opts.alpha0 * max_step(s.x, dx, s.z, dz, s.tau, dtau, s.kappa, dkappa)
            )

            an = alpha[:, None]
            xn = s.x + an * dx
            yn = s.y + an * dy
            zn = s.z + an * dz
            taun = s.tau + alpha * dtau
            kappan = s.kappa + alpha * dkappa
            finite = (
                psum(
                    jnp.sum(~jnp.isfinite(xn), axis=-1)
                    + jnp.sum(~jnp.isfinite(zn), axis=-1)
                )
                == 0
            ) & jnp.isfinite(taun) & (taun > 0)
            status = jnp.where(
                (status == _RUNNING) & ~finite, jnp.int32(int(Status.NUMERICAL)), status
            )
            take = status == _RUNNING
            tn = take[:, None]
            return ColState(
                x=jnp.where(tn, xn, s.x),
                y=jnp.where(tn, yn, s.y),
                z=jnp.where(tn, zn, s.z),
                tau=jnp.where(take, taun, s.tau),
                kappa=jnp.where(take, kappan, s.kappa),
                status=status,
                iterations=jnp.where(take, s.iterations + 1, s.iterations),
                k=s.k + 1,
            )

        s = lax.while_loop(cond, body, s0)
        rp, rd, rg, mu = residuals(s)
        status = classify(s, rp, rd, rg, mu)
        status = jnp.where(
            status == _RUNNING, jnp.int32(int(Status.ITERATION_LIMIT)), status
        )
        tau_safe = jnp.maximum(s.tau, jnp.asarray(jnp.finfo(dtype).tiny, dtype))
        x_hat = s.x / tau_safe[:, None]
        y_hat = s.y / tau_safe[:, None]
        objective = pdot(c_l, x_hat)
        return {
            "x": x_hat,
            "z": s.z / tau_safe[:, None],
            "y": y_hat,
            "objective": objective,
            "status": status,
            "iterations": s.iterations,
        }

    with jax.default_matmul_precision("highest"):
        out = solve(A, b, c)
    if squeeze:
        out = {k_: v[0] for k_, v in out.items()}
    return out

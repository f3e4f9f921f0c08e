"""Column-sharded HSD for single LPs larger than one chip.

The "model parallel" slot of SURVEY.md §2.3 (no upstream analogue):
variables (columns of A) partition across the mesh; each device holds
``A_loc (m, n/P)``, ``x/z/c`` shards, while ``y/b`` and the m×m normal
matrix are replicated.  Per iteration:

* ``M = Σ_p A_p D_p A_pᵀ`` — local Gram matrices assembled with ONE
  ``psum`` over the model axis (the Schur-complement-style reduction of
  BASELINE.json's north star: the only collective in the hot loop,
  riding ICI);
* Cholesky + triangular solves run on the replicated M on every device
  (m ≪ n: redundant compute is cheaper than sharding an m×m factor);
* matvecs ``A@x`` psum; ``Aᵀy`` is purely local; dot products and the
  ratio test reduce with psum/pmin.

Termination quantities are replicated by construction, so the
``while_loop`` predicate is consistent across devices with no extra
collective.
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
    x: jnp.ndarray  # (n_loc,)
    y: jnp.ndarray  # (m,) replicated
    z: jnp.ndarray  # (n_loc,)
    tau: jnp.ndarray
    kappa: jnp.ndarray
    status: jnp.ndarray
    k: jnp.ndarray


def column_sharded_hsd_solve(
    A,
    b,
    c,
    opts: SolverOptions = SolverOptions(),
    mesh: Mesh | None = None,
):
    """Solve ONE equality-form LP ``min cᵀx, Ax=b, x≥0`` with columns
    sharded over the mesh.  n must divide by the mesh size.

    Returns dict(x, y, objective, status, iterations) with x sharded.
    """
    if mesh is None:
        mesh = model_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    m, n = A.shape
    if n % n_dev:
        raise ValueError(f"n={n} not divisible by mesh size {n_dev}")

    dtype = jnp.dtype(opts.dtype) if opts.dtype else jnp.result_type(A, b, c)
    A = jnp.asarray(A, dtype)
    b = jnp.asarray(b, dtype)
    c = jnp.asarray(c, dtype)
    n_total = n

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P(axis)),
        out_specs={
            "x": P(axis),
            "z": P(axis),
            "y": P(),
            "objective": P(),
            "status": P(),
            "iterations": P(),
        },
        check_vma=False,
    )
    def solve(A_l, b_r, c_l):
        def psum(v):
            return lax.psum(v, axis)

        def pmin(v):
            return lax.pmin(v, axis)

        def mv(x_l):  # A @ x → (m,) replicated
            return psum(A_l @ x_l)

        def rmv(y_r):  # Aᵀ y → local shard
            return A_l.T @ y_r

        def pdot(u_l, v_l):
            return psum(jnp.dot(u_l, v_l))

        reg_eps = opts.resolved_reg_eps(dtype)

        def residuals(s: ColState):
            rp = b_r * s.tau - mv(s.x)
            rd = c_l * s.tau - rmv(s.y) - s.z
            rg = pdot(c_l, s.x) - jnp.dot(b_r, s.y) + s.kappa
            mu = (pdot(s.x, s.z) + s.tau * s.kappa) / (n_total + 1)
            return rp, rd, rg, mu

        def dnorm(v_l):  # 2-norm of a column-sharded vector
            return jnp.sqrt(psum(jnp.dot(v_l, v_l)))

        x0 = jnp.ones_like(c_l)
        y0 = jnp.zeros_like(b_r)
        z0 = jnp.ones_like(c_l)
        one = jnp.asarray(1.0, dtype)
        s0 = ColState(x0, y0, z0, one, one, _RUNNING, jnp.int32(0))
        rp, rd, rg, mu = residuals(s0)
        rp0 = jnp.maximum(1.0, jnp.linalg.norm(rp))
        rd0 = jnp.maximum(1.0, dnorm(rd))
        rg0 = jnp.maximum(1.0, jnp.abs(rg))
        mu0 = mu

        def classify(s, rp, rd, rg, mu):
            by = jnp.dot(b_r, s.y)
            rho_p = jnp.linalg.norm(rp) / rp0
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
            return jnp.where(
                (s.status == _RUNNING) & optimal,
                jnp.int32(int(Status.OPTIMAL)),
                jnp.where((s.status == _RUNNING) & (inf1 | inf2), infs, s.status),
            )

        def max_step(x, dx, z, dz, tau, dtau, kappa, dkappa):
            big = jnp.asarray(jnp.finfo(dtype).max, dtype)

            def ratios(v, dv):
                r = jnp.where(dv < 0, v / jnp.where(dv < 0, -dv, 1.0), big)
                return jnp.min(r) if r.size else big

            a = pmin(jnp.minimum(ratios(x, dx), ratios(z, dz)))
            a = jnp.minimum(a, jnp.where(dtau < 0, tau / jnp.where(dtau < 0, -dtau, 1.0), big))
            a = jnp.minimum(
                a, jnp.where(dkappa < 0, kappa / jnp.where(dkappa < 0, -dkappa, 1.0), big)
            )
            return a

        def cond(s):
            return (s.k < opts.maxiter) & (s.status == _RUNNING)

        def body(s):
            rp, rd, rg, mu = residuals(s)
            status = classify(s, rp, rd, rg, mu)

            dinv = s.x / s.z
            # the Schur/psum assembly: M = Σ_p A_p D_p A_pᵀ (replicated)
            M = psum(jnp.einsum("in,n,jn->ij", A_l, dinv, A_l))
            diag_max = jnp.max(jnp.diagonal(M))
            M = M + (reg_eps * diag_max) * jnp.eye(m, dtype=dtype)
            L = lax.linalg.cholesky(M)

            def msolve(r):  # replicated m-system
                t = lax.linalg.triangular_solve(L, r[:, None], left_side=True, lower=True)
                return lax.linalg.triangular_solve(
                    L, t, left_side=True, lower=True, transpose_a=True
                )[:, 0]

            def sym_solve(r1_l, r2_r):
                v = msolve(r2_r + mv(dinv * r1_l))
                u = dinv * (rmv(v) - r1_l)
                return u, v

            p, q = sym_solve(c_l, b_r)
            denom = s.kappa / s.tau + jnp.dot(b_r, q) - pdot(c_l, p)

            def newton(eta, gmu, dxa, dza, dta, dka):
                rxs = gmu - s.x * s.z - dxa * dza
                rtk = gmu - s.tau * s.kappa - dta * dka
                r1 = eta * rd - rxs / s.x
                u, v = sym_solve(r1, eta * rp)
                dtau = (eta * rg + rtk / s.tau - (jnp.dot(b_r, v) - pdot(c_l, u))) / denom
                dx = u + p * dtau
                dy = v + q * dtau
                dz = (rxs - s.z * dx) / s.x
                dkappa = (rtk - s.kappa * dtau) / s.tau
                return dx, dy, dz, dtau, dkappa

            zero_l = jnp.zeros_like(s.x)
            zero = jnp.asarray(0.0, dtype)
            dxa, dya, dza, dta, dka = newton(1.0, zero, zero_l, zero_l, zero, zero)
            a_aff = jnp.minimum(1.0, max_step(s.x, dxa, s.z, dza, s.tau, dta, s.kappa, dka))
            mu_aff = (
                pdot(s.x + a_aff * dxa, s.z + a_aff * dza)
                + (s.tau + a_aff * dta) * (s.kappa + a_aff * dka)
            ) / (n_total + 1)
            gamma = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)
            dx, dy, dz, dtau, dkappa = newton(1.0 - gamma, gamma * mu, dxa, dza, dta, dka)
            alpha = jnp.minimum(
                1.0, opts.alpha0 * max_step(s.x, dx, s.z, dz, s.tau, dtau, s.kappa, dkappa)
            )

            xn = s.x + alpha * dx
            yn = s.y + alpha * dy
            zn = s.z + alpha * dz
            taun = s.tau + alpha * dtau
            kappan = s.kappa + alpha * dkappa
            finite = (
                psum(jnp.sum(~jnp.isfinite(xn)) + jnp.sum(~jnp.isfinite(zn))) == 0
            ) & jnp.isfinite(taun) & (taun > 0)
            status = jnp.where(
                (status == _RUNNING) & ~finite, jnp.int32(int(Status.NUMERICAL)), status
            )
            take = status == _RUNNING
            return ColState(
                x=jnp.where(take, xn, s.x),
                y=jnp.where(take, yn, s.y),
                z=jnp.where(take, zn, s.z),
                tau=jnp.where(take, taun, s.tau),
                kappa=jnp.where(take, kappan, s.kappa),
                status=status,
                k=s.k + 1,
            )

        s = lax.while_loop(cond, body, s0)
        rp, rd, rg, mu = residuals(s)
        status = classify(s, rp, rd, rg, mu)
        status = jnp.where(
            status == _RUNNING, jnp.int32(int(Status.ITERATION_LIMIT)), status
        )
        tau_safe = jnp.maximum(s.tau, jnp.asarray(jnp.finfo(dtype).tiny, dtype))
        x_hat = s.x / tau_safe
        y_hat = s.y / tau_safe
        objective = pdot(c_l, x_hat)
        return {
            "x": x_hat,
            "z": s.z / tau_safe,
            "y": y_hat,
            "objective": objective,
            "status": status,
            "iterations": s.k,
        }

    with jax.default_matmul_precision("highest"):
        return solve(A, b, c)

"""Scenario-axis sharding of the batched HSD solve over a device mesh.

No upstream analogue — pycllp is single-device (SURVEY.md §2.3); this is
the capability the TPU platform adds: the scenario batch partitions over
a named mesh axis via ``shard_map``, and per-iteration termination is
gated either

* ``collective`` — a cross-device ``pmax`` of the local any-active mask
  inside the jitted ``while_loop`` (all shards step in lockstep; no host
  round-trip — the BASELINE.json "collective convergence gating"), or
* ``local`` — each shard runs its own loop and finishes independently
  (no per-iteration sync; best throughput for independent instances).

Shared-structure A is replicated; per-instance A shards with the batch.
On one device the mesh degrades gracefully to a no-op partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pycllp_tpu.ops.reference import KernelSet, REFERENCE_KERNELS
from pycllp_tpu.solvers.hsd import hsd_solve_batched
from pycllp_tpu.solvers.options import SolverOptions

__all__ = ["scenario_mesh", "CollectiveAny", "sharded_hsd_solve"]


def scenario_mesh(n_devices: int | None = None, axis: str = "scenario") -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices (default all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


@dataclass(frozen=True)
class CollectiveAny:
    """Hashable mask reduction: any(mask) OR-reduced across a mesh axis.

    Frozen-dataclass (not a lambda) so it is a stable static jit argument
    — a fresh lambda per call would defeat the jit cache.
    """

    axis: str

    def __call__(self, mask):
        local = jnp.any(mask).astype(jnp.int32)
        return jax.lax.pmax(local, self.axis) > 0


def sharded_hsd_solve(
    A,
    b,
    c,
    opts: SolverOptions = SolverOptions(),
    mesh: Mesh | None = None,
    kset: KernelSet = REFERENCE_KERNELS,
    termination: str = "collective",
):
    """Solve equality-form LP batch with the scenario axis sharded.

    ``b``/``c`` are (B, m)/(B, n) with B divisible by the mesh size;
    ``A`` is (m, n) shared (replicated) or (B, m, n) (sharded).
    Returns the same dict as :func:`hsd_solve_batched`, with outputs
    sharded over the scenario axis.
    """
    if mesh is None:
        mesh = scenario_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    B = b.shape[0]
    if B % n_dev:
        raise ValueError(f"batch {B} not divisible by mesh size {n_dev}")
    if termination not in ("collective", "local"):
        raise ValueError(f"unknown termination {termination!r}")

    a_spec = P(axis) if np.ndim(A) == 3 else P()
    reduce_any = CollectiveAny(axis) if termination == "collective" else jnp.any

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(a_spec, P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def local_solve(A_l, b_l, c_l):
        return hsd_solve_batched(A_l, b_l, c_l, opts, kset, reduce_any)

    return local_solve(A, b, c)

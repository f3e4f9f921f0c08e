"""Two-pass compacted batch solve: cap, compact, re-solve.

A batched ``lax.while_loop`` runs every lane of a chunk until the SLOWEST
lane terminates, so chunk cost is governed by the max iteration count
while useful work is the mean (observed on the bench workload: mean ~13,
max ~26).  The upstream OpenCL design has the same property per work-group
(reference mount empty this build — SURVEY.md §0); pycllp simply ate the
divergence.  On TPU we can do better with a host-side compaction pass:

1. **Pass 1** — solve every chunk with a short iteration cap
   (``pass1_maxiter``).  Chunk dispatches stay asynchronous (no host sync
   between chunks), so remote-dispatch latency pipelines.
2. **Compact** — pull only the statuses; lanes that hit the cap
   (``Status.ITERATION_LIMIT``) across ALL chunks are gathered into one
   dense remnant batch, padded to a bucket size to keep compiled shapes
   stable.
3. **Pass 2** — the remnant re-solves from scratch with the full
   ``opts.maxiter`` budget; results scatter back over the pass-1 rows.

Typical win: chunk cost drops from max-lane to roughly
``pass1_maxiter + remnant_fraction * max_lane``.  Correctness is
unaffected — a from-scratch re-solve of an LP is the same LP; lanes that
finished in pass 1 keep their pass-1 answers, and `iterations` for
remnant lanes reports the pass-2 (true from-scratch) count.
"""

from __future__ import annotations

import numpy as np

from pycllp_tpu.ops.reference import KernelSet, REFERENCE_KERNELS
from pycllp_tpu.solvers.hsd import hsd_solve_batched
from pycllp_tpu.solvers.options import SolverOptions, Status

__all__ = ["hsd_solve_two_pass"]

_OUT_KEYS = (
    "x", "y", "z", "tau", "kappa", "objective", "status", "iterations",
    "rho_p", "rho_d", "rho_gap",
)


def _bucket(size: int, min_bucket: int, max_bucket: int) -> int:
    """Smallest power-of-two bucket ≥ size (clamped) — stable jit shapes."""
    b = min_bucket
    while b < size and b < max_bucket:
        b *= 2
    return min(b, max_bucket)


def hsd_solve_two_pass(
    A,
    b,
    c,
    opts: SolverOptions = SolverOptions(),
    kset: KernelSet = REFERENCE_KERNELS,
    *,
    chunk: int | None = None,
    pass1_maxiter: int = 16,
    min_bucket: int = 1024,
    reduce_any=None,
    keys: tuple = _OUT_KEYS,
):
    """Solve ``min cᵀx, Ax=b, x≥0`` batched, with remnant compaction.

    Parameters mirror :func:`hsd_solve_batched`; additionally:

    chunk : rows per pass-1 dispatch (default: the whole batch at once).
    pass1_maxiter : iteration cap for pass 1.  Lanes still running at the
        cap are re-solved in pass 2 with the full ``opts.maxiter``.
    min_bucket : smallest remnant padding bucket (keeps the number of
        distinct compiled shapes logarithmic in batch size).
    keys : which output fields to materialise on host.  Only ``status``
        is pulled eagerly (it drives compaction); skipping the big
        per-lane arrays (x, y, z) avoids ~MBs of device→host traffic
        when only objectives/statuses are wanted.

    Returns the same dict of (host) arrays as ``hsd_solve_batched``,
    restricted to ``keys`` (+ ``status``).
    """
    b = np.asarray(b)
    c = np.asarray(c)
    B = b.shape[0]
    chunk = B if chunk is None else min(chunk, B)
    if B % chunk:
        raise ValueError(f"batch {B} must be a multiple of chunk {chunk}")
    batched_A = getattr(A, "ndim", 2) == 3
    opts1 = opts.replace(maxiter=pass1_maxiter)
    kw = {} if reduce_any is None else {"reduce_any": reduce_any}

    # pass 1: async chunk dispatches (device handles collected, then the
    # ONLY eager pull is the status vector that drives compaction)
    pass1 = []
    for k in range(B // chunk):
        sl = slice(k * chunk, (k + 1) * chunk)
        Ak = A[sl] if batched_A else A
        pass1.append(hsd_solve_batched(Ak, b[sl], c[sl], opts1, kset, **kw))
    status = np.concatenate([np.asarray(p["status"]) for p in pass1])

    remnant = np.flatnonzero(status == int(Status.ITERATION_LIMIT))
    subs = []  # (row indices, pass-2 device results)
    if remnant.size and opts.maxiter > pass1_maxiter:
        # pass 2: compact the unfinished lanes into padded bucket batches
        nb = _bucket(remnant.size, min_bucket, chunk)
        for s in range(-(-remnant.size // nb)):
            idx = remnant[s * nb : (s + 1) * nb]
            pad = nb - idx.size
            rows = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad else idx
            Ar = A[rows] if batched_A else A
            subs.append((idx, hsd_solve_batched(Ar, b[rows], c[rows], opts, kset, **kw)))

    out = {}
    for key in dict.fromkeys(("status",) + tuple(keys)):
        vals = (
            status.copy()
            if key == "status"
            else np.concatenate([np.asarray(p[key]) for p in pass1])
        )
        for idx, res in subs:
            vals[idx] = np.asarray(res[key])[: idx.size]
        out[key] = vals
    return out

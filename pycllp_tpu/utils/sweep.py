"""Chunked scenario-sweep driver with checkpoint/resume.

The BASELINE.json config-5 capability: a stochastic-LP sweep (shared A,
per-scenario b/c — the pywr-style init-once/re-solve pattern at scale)
streamed through the batched solver in chunks, each chunk's results
persisted so an interrupted sweep resumes by skipping completed chunks
(SURVEY.md §5 checkpoint/resume disposition: no in-iteration
checkpointing — an IPM solve is cheap to redo; the chunk is the unit).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np

import jax

from pycllp_tpu.solvers.hsd import hsd_solve_batched
from pycllp_tpu.solvers.options import SolverOptions

__all__ = ["SweepResult", "scenario_sweep"]

_MANIFEST = "manifest.json"


@dataclass
class SweepResult:
    objective: np.ndarray  # (N,)
    status: np.ndarray  # (N,)
    iterations: np.ndarray  # (N,)
    n_chunks: int
    n_resumed: int  # chunks skipped because already on disk


def _chunk_path(out_dir: str, k: int) -> str:
    return os.path.join(out_dir, f"chunk_{k:06d}.npz")


def scenario_sweep(
    A: np.ndarray,
    b: np.ndarray,
    c: np.ndarray,
    opts: SolverOptions = SolverOptions(),
    *,
    chunk: int = 16384,
    out_dir: str | None = None,
    save_x: bool = False,
    mesh=None,
    solve_fn: Callable | None = None,
    progress: Callable[[int, int], None] | None = None,
) -> SweepResult:
    """Solve N scenarios (shared A, batched b/c) in chunks.

    With ``out_dir`` set, per-chunk results persist as ``chunk_*.npz``
    and a manifest pins (shapes, chunk, tol) so a restarted sweep with
    the same configuration skips completed chunks; a mismatched
    configuration raises rather than silently mixing results.
    """
    N = b.shape[0]
    if c.shape[0] != N:
        raise ValueError("b and c must agree on the scenario count")
    n_chunks = -(-N // chunk)

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        manifest = {
            "N": int(N),
            "chunk": int(chunk),
            "m": int(A.shape[-2]),
            "n": int(A.shape[-1]),
            "tol": opts.tol,
            "dtype": str(np.dtype(opts.dtype) if opts.dtype else b.dtype),
            "save_x": bool(save_x),
        }
        mpath = os.path.join(out_dir, _MANIFEST)
        if os.path.exists(mpath):
            old = json.load(open(mpath))
            if old != manifest:
                raise ValueError(
                    f"sweep dir {out_dir} holds a different configuration:"
                    f" {old} != {manifest}"
                )
        else:
            json.dump(manifest, open(mpath, "w"))

    if solve_fn is None:
        if mesh is not None:
            from pycllp_tpu.parallel import sharded_hsd_solve

            def solve_fn(Ab, bb, cb):
                return sharded_hsd_solve(Ab, bb, cb, opts, mesh=mesh)

        else:

            def solve_fn(Ab, bb, cb):
                return hsd_solve_batched(Ab, bb, cb, opts)

    objective = np.zeros(N)
    status = np.zeros(N, np.int32)
    iterations = np.zeros(N, np.int32)
    n_resumed = 0

    for k in range(n_chunks):
        lo, hi = k * chunk, min((k + 1) * chunk, N)
        path = _chunk_path(out_dir, k) if out_dir else None
        if path and os.path.exists(path):
            data = np.load(path)
            objective[lo:hi] = data["objective"]
            status[lo:hi] = data["status"]
            iterations[lo:hi] = data["iterations"]
            n_resumed += 1
            continue
        bb, cb = b[lo:hi], c[lo:hi]
        pad = 0
        if hi - lo < chunk:  # keep one compiled shape for the tail chunk
            pad = chunk - (hi - lo)
            bb = np.concatenate([bb, np.repeat(bb[-1:], pad, 0)], 0)
            cb = np.concatenate([cb, np.repeat(cb[-1:], pad, 0)], 0)
        out = solve_fn(A, bb, cb)
        obj = np.asarray(out["objective"])[: hi - lo]
        st = np.asarray(out["status"])[: hi - lo]
        it = np.asarray(out["iterations"])[: hi - lo]
        objective[lo:hi] = obj
        status[lo:hi] = st
        iterations[lo:hi] = it
        if path:
            payload = {"objective": obj, "status": st, "iterations": it}
            if save_x:
                payload["x"] = np.asarray(out["x"])[: hi - lo]
            tmp = path + ".tmp.npz"
            np.savez(tmp, **payload)
            os.replace(tmp, path)  # atomic: a crash never leaves half-chunks
        if progress is not None:
            progress(k + 1, n_chunks)

    return SweepResult(
        objective=objective,
        status=status,
        iterations=iterations,
        n_chunks=n_chunks,
        n_resumed=n_resumed,
    )

"""Micro-bench Cholesky kernel variants (chained-K methodology).

Variants:
  cur   — shipping kernel: shrinking sub-block rank-1 updates
  full  — full-block masked-column updates: 3x the FLOPs, every op
          aligned (m, m, 128) constant shape
  floor — per-step full-block FMA only (no scalar column work): the
          aligned-update speed-of-light for this loop structure
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

LANES = 128
M, B, K = 64, 16384, 30


def _chol_body_cur(l_ref, dinv_ref, reg, m):
    nan = jnp.asarray(jnp.nan, l_ref.dtype)
    for k in range(m):
        akk = l_ref[k, k, :] + reg
        pos = akk > 0
        sq = jnp.sqrt(jnp.where(pos, akk, 1.0))
        inv = jnp.where(pos, 1.0 / sq, nan)
        l_ref[k, k, :] = jnp.where(pos, sq, nan)
        dinv_ref[k, :] = inv
        if k + 1 < m:
            col = l_ref[k + 1 :, k, :] * inv[None, :]
            l_ref[k + 1 :, k, :] = col
            l_ref[k + 1 :, k + 1 :, :] = (
                l_ref[k + 1 :, k + 1 :, :] - col[:, None, :] * col[None, :, :]
            )


def _chol_body_full(l_ref, dinv_ref, reg, m):
    nan = jnp.asarray(jnp.nan, l_ref.dtype)
    row_ids = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    for k in range(m):
        akk = l_ref[k, k, :] + reg
        pos = akk > 0
        sq = jnp.sqrt(jnp.where(pos, akk, 1.0))
        inv = jnp.where(pos, 1.0 / sq, nan)
        dinv_ref[k, :] = inv
        col = jnp.where(row_ids > k, l_ref[:, k, :] * inv[None, :], 0.0)
        l_ref[:, k, :] = col
        l_ref[k, k, :] = jnp.where(pos, sq, nan)
        l_ref[:, :, :] = l_ref[:, :, :] - col[:, None, :] * col[None, :, :]


def _chol_body_floor(l_ref, dinv_ref, reg, m):
    col = l_ref[:, 0, :] * 0.5
    for k in range(m):
        l_ref[:, :, :] = l_ref[:, :, :] - col[:, None, :] * col[None, :, :]
    dinv_ref[:, :] = l_ref[0, :, :]


def _chol_body_slab(l_ref, dinv_ref, reg, m):
    """Shrink rows (untiled dim) freely; keep the sublane dim 8-aligned."""
    nan = jnp.asarray(jnp.nan, l_ref.dtype)
    for k in range(m):
        akk = l_ref[k, k, :] + reg
        pos = akk > 0
        sq = jnp.sqrt(jnp.where(pos, akk, 1.0))
        inv = jnp.where(pos, 1.0 / sq, nan)
        l_ref[k, k, :] = jnp.where(pos, sq, nan)
        dinv_ref[k, :] = inv
        if k + 1 < m:
            j0 = ((k + 1) // 8) * 8
            col = l_ref[k + 1 :, k, :] * inv[None, :]
            l_ref[k + 1 :, k, :] = col
            pad = k + 1 - j0
            colj = col if pad == 0 else jnp.concatenate(
                [jnp.zeros((pad, col.shape[1]), col.dtype), col], axis=0
            )
            l_ref[k + 1 :, j0:, :] = (
                l_ref[k + 1 :, j0:, :] - col[:, None, :] * colj[None, :, :]
            )


def make_blk(r):
    def _chol_body_blk(l_ref, dinv_ref, reg, m):
        """Rank-r panel updates: the trailing slab is read+written once
        per panel (1/r the VMEM traffic of per-column rank-1 updates);
        the r outer products accumulate elementwise in registers."""
        nan = jnp.asarray(jnp.nan, l_ref.dtype)
        for p in range(0, m, r):
            pe = min(p + r, m)
            for k in range(p, pe):
                akk = l_ref[k, k, :] + reg
                pos = akk > 0
                sq = jnp.sqrt(jnp.where(pos, akk, 1.0))
                inv = jnp.where(pos, 1.0 / sq, nan)
                l_ref[k, k, :] = jnp.where(pos, sq, nan)
                dinv_ref[k, :] = inv
                if k + 1 < m:
                    col = l_ref[k + 1 :, k, :] * inv[None, :]
                    l_ref[k + 1 :, k, :] = col
                    w = pe - k - 1
                    if w > 0:
                        # aligned panel-width update: zero colj entries for
                        # already-final columns p..k (narrow odd-width ref
                        # slices lower via gather and fail on Mosaic)
                        zpad = jnp.zeros((k + 1 - p, col.shape[-1]), col.dtype)
                        colj = jnp.concatenate([zpad, col[:w, :]], axis=0)
                        l_ref[k + 1 :, p:pe, :] = (
                            l_ref[k + 1 :, p:pe, :]
                            - col[:, None, :] * colj[None, :, :]
                        )
            if pe < m:
                cts = [l_ref[pe:, t, :] for t in range(p, pe)]
                upd = cts[0][:, None, :] * cts[0][None, :, :]
                for ct in cts[1:]:
                    upd = upd + ct[:, None, :] * ct[None, :, :]
                l_ref[pe:, pe:, :] = l_ref[pe:, pe:, :] - upd
    return _chol_body_blk


def make_mxu_panel(r):
    """VERDICT r1 item 2(b): rank-r panel, trailing update as ONE
    lane-batched MXU dot_general per panel (batch dim = lanes)."""

    def body(l_ref, dinv_ref, reg, m):
        nan = jnp.asarray(jnp.nan, l_ref.dtype)
        for p in range(0, m, r):
            pe = min(p + r, m)
            for k in range(p, pe):
                akk = l_ref[k, k, :] + reg
                pos = akk > 0
                sq = jnp.sqrt(jnp.where(pos, akk, 1.0))
                inv = jnp.where(pos, 1.0 / sq, nan)
                l_ref[k, k, :] = jnp.where(pos, sq, nan)
                dinv_ref[k, :] = inv
                if k + 1 < m:
                    col = l_ref[k + 1 :, k, :] * inv[None, :]
                    l_ref[k + 1 :, k, :] = col
                    w = pe - k - 1
                    if w > 0:
                        zpad = jnp.zeros((k + 1 - p, col.shape[-1]), col.dtype)
                        colj = jnp.concatenate([zpad, col[:w, :]], axis=0)
                        l_ref[k + 1 :, p:pe, :] = (
                            l_ref[k + 1 :, p:pe, :]
                            - col[:, None, :] * colj[None, :, :]
                        )
            if pe < m:
                P = l_ref[pe:, p:pe, :]  # (m-pe, r, LANES)
                upd = lax.dot_general(
                    P, P, (((1,), (1,)), ((2,), (2,))),
                    preferred_element_type=jnp.float32,
                )  # -> (LANES, m-pe, m-pe), batch dims leading
                l_ref[pe:, pe:, :] = l_ref[pe:, pe:, :] - jnp.moveaxis(upd, 0, -1)

    return body


def make_pair_mxu(m=M, pk=16):
    """VERDICT r1 item 2(a): pack TWO m=64 instances block-diagonally in
    one (128, 128) tile, factor with pk-wide panels whose trailing
    updates are plain 2-D MXU matmuls (25%-useful FLOPs by design: the
    off-diagonal blocks of the pair are zero)."""

    def kern(m_ref, reg_ref, l_ref, dinv_ref):
        l_ref[:] = m_ref[:]
        reg = reg_ref[0, :]  # (2,) per-instance shift, broadcast below
        mm = 2 * m
        nan = jnp.asarray(jnp.nan, l_ref.dtype)
        row_ids = lax.broadcasted_iota(jnp.int32, (mm, 1), 0)[:, 0]
        for p in range(0, mm, pk):
            pe = p + pk
            for k in range(p, pe):
                rk = reg[0] if k < m else reg[1]
                akk = l_ref[k, k] + rk
                pos = akk > 0
                sq = jnp.sqrt(jnp.where(pos, akk, 1.0))
                inv = jnp.where(pos, 1.0 / sq, nan)
                l_ref[k, k] = jnp.where(pos, sq, nan)
                dinv_ref[0, k] = inv
                # masked full-column update (column slices of a 2-D block
                # are sublane-cheap here: the block IS one (128,128) tile)
                colf = jnp.where(row_ids > k, l_ref[:, k] * inv, 0.0)
                l_ref[:, k] = colf + jnp.where(row_ids == k, l_ref[:, k], 0.0)
                if k + 1 < pe:
                    # rank-1 update restricted to panel columns k+1..pe-1
                    mask = (row_ids[None, :] > k) & (row_ids[None, :] < pe)
                    l_ref[:, :] = l_ref[:, :] - colf[:, None] * jnp.where(
                        mask, colf[None, :], 0.0
                    )
            if pe < mm:
                P = l_ref[pe:, p:pe]  # (mm-pe, pk)
                l_ref[pe:, pe:] = l_ref[pe:, pe:] - jnp.dot(
                    P, P.T, preferred_element_type=jnp.float32
                )

    l_spec = pl.BlockSpec((2 * m, 2 * m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    reg_spec = pl.BlockSpec((1, 2), lambda i: (i, 0), memory_space=pltpu.SMEM)
    dinv_spec = pl.BlockSpec((1, 2 * m), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(M2, reg2):
        npair = M2.shape[0] // (2 * m)
        return pl.pallas_call(
            kern,
            grid=(npair,),
            in_specs=[l_spec, reg_spec],
            out_specs=[l_spec, dinv_spec],
            out_shape=[
                jax.ShapeDtypeStruct(M2.shape, M2.dtype),
                jax.ShapeDtypeStruct((npair, 2 * m), M2.dtype),
            ],
        )(M2, reg2)

    return run


BODIES = {  # slow variants pruned after first interleaved run
    "cur": _chol_body_cur,
    "floor": _chol_body_floor,
}
_UNUSED = {
    "cur": _chol_body_cur,
    "blk4": make_blk(4),
    "blk8": make_blk(8),
    "blk16": make_blk(16),
    "slab": _chol_body_slab,
    "full": _chol_body_full,
    "floor": _chol_body_floor,
}


def make_chol(body, m, lanes=LANES):
    def kern(m_ref, reg_ref, l_ref, dinv_ref):
        l_ref[:] = m_ref[:]
        body(l_ref, dinv_ref, reg_ref[0, :], m)

    l_spec = pl.BlockSpec((m, m, lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    dinv_spec = pl.BlockSpec((m, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    reg_spec = pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)

    @jax.jit
    def run(Mmat, reg):
        return pl.pallas_call(
            kern,
            grid=(Mmat.shape[-1] // lanes,),
            in_specs=[l_spec, reg_spec],
            out_specs=[l_spec, dinv_spec],
            out_shape=[
                jax.ShapeDtypeStruct(Mmat.shape, Mmat.dtype),
                jax.ShapeDtypeStruct((m, Mmat.shape[-1]), Mmat.dtype),
            ],
        )(Mmat, reg[None, :])

    return run


rng = np.random.default_rng(0)
Amat = rng.normal(size=(M, 2 * M)).astype(np.float32)
Mh = (Amat @ Amat.T + 2 * M * np.eye(M)).astype(np.float32)
Mmat = jax.device_put(np.broadcast_to(Mh[:, :, None], (M, M, B)).copy())
reg = jax.device_put(np.full((B,), 1e-5, np.float32))

# correctness: full vs cur
L_cur, d_cur = make_chol(_chol_body_cur, M)(Mmat, reg)
L_full, d_full = make_chol(make_blk(8), M)(Mmat, reg)
lc = np.tril(np.asarray(L_cur[:, :, 0]))
lf = np.tril(np.asarray(L_full[:, :, 0]))
print("tril max diff cur-vs-full:", np.abs(lc - lf).max(),
      " dinv diff:", np.abs(np.asarray(d_cur) - np.asarray(d_full)).max(), flush=True)

def make_chained(run):
    @jax.jit
    def chained(Mmat, reg):
        def step(i, carry):
            L, d = run(Mmat + 0.0 * carry[0][:1, :1, :1], reg)
            return (L, d)
        return lax.fori_loop(0, K, step, (Mmat, jnp.zeros((M, B), Mmat.dtype)))
    return chained


@jax.jit
def empty(Mmat, reg):
    def step(i, carry):
        return (carry[0] + 0.0, carry[1])
    return lax.fori_loop(0, K, step, (Mmat, jnp.zeros((M, B), Mmat.dtype)))


VARIANTS = {name: (body, LANES) for name, body in BODIES.items()}
VARIANTS["cur256"] = (_chol_body_cur, 256)
VARIANTS["mxu_panel8"] = (make_mxu_panel(8), LANES)
VARIANTS["mxu_panel16"] = (make_mxu_panel(16), LANES)


# ---- VERDICT r1 item 2(a): 2-instances-per-(128,128)-tile MXU variant ----
def run_pair_variant():
    import traceback

    B_pair = int(2048)
    np_pair = B_pair // 2
    M2 = np.zeros((np_pair * 2 * M, 2 * M), np.float32)
    for p in range(np_pair):
        M2[p * 2 * M : p * 2 * M + M, :M] = Mh
        M2[p * 2 * M + M : (p + 1) * 2 * M, M:] = Mh
    reg2 = np.full((np_pair, 2), 1e-5, np.float32)
    M2d = jax.device_put(M2)
    reg2d = jax.device_put(reg2)
    try:
        run = make_pair_mxu()
        L2, d2 = run(M2d, reg2d)
        l0 = np.tril(np.asarray(L2[:M, :M]))
        lc = np.tril(np.asarray(make_chol(_chol_body_cur, M)(Mmat, reg)[0][:, :, 0]))
        print(f"pair-mxu correctness: tril diff {np.abs(l0 - lc).max():.2e}", flush=True)
        np.asarray(run(M2d, reg2d)[1])
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = run(M2d, reg2d)
        np.asarray(out[1])
        per = (time.time() - t0) / reps
        scaled = per * (B / B_pair)
        print(
            f"pair-mxu: {per*1e3:.2f} ms for {B_pair} inst "
            f"(= {scaled*1e3:.2f} ms at B={B}; single-apply, incl dispatch)",
            flush=True,
        )
    except Exception as e:
        print(f"pair-mxu: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        traceback.print_exc(limit=2)



chains = {}
for name, (body, lanes) in VARIANTS.items():
    try:
        chains[name] = make_chained(make_chol(body, M, lanes))
        out = chains[name](Mmat, reg); np.asarray(out[1])  # compile
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        del chains[name]
np.asarray(empty(Mmat, reg)[1])

best = {name: float("inf") for name in chains}
tb = float("inf")
for cycle in range(6):
    t0 = time.time(); np.asarray(empty(Mmat, reg)[1]); tb = min(tb, time.time() - t0)
    for name, chained in chains.items():
        t0 = time.time(); np.asarray(chained(Mmat, reg)[1])
        best[name] = min(best[name], time.time() - t0)
for name in chains:
    per = (best[name] - tb) / K
    gf = (M**3 / 3) * B / per / 1e12
    print(f"{name:6s}: {per*1e3:7.3f} ms/apply   ({gf:.2f} useful TFLOP/s)", flush=True)

run_pair_variant()

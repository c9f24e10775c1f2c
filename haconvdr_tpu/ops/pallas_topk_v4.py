"""Pallas TPU kernel v4: window-top-2 exact inner-product top-k.

Replaces the v3 fused-insert kernel's selection machinery for the unseeded
batch-search path (faiss ``IndexFlatIP.search`` analog,
src/test_HAConvDR_topiocqa.py:98-108).

Why v3 plateaued (round-3 on-chip bisection, NOTES.md): v3's per-segment
insert machinery + exactness rounds cost ~80 of its 96-100 ms at 2.5M —
and threshold seeding recovers only ~4 ms, because (a) the dynamic row-min
already tightens past any static sample bound after the early tiles and
(b) the 256-row-lockstep `@pl.when` exactness rounds fire on nearly every
(tile, subtile) cell no matter how tight the threshold: with ~100-6400
candidates per query spread over 19.5k segments, SOME row of the 256-row
cell always has a contended segment.

v4 removes the per-segment insert/round machinery entirely.  The kernel
does only data-oblivious work — matmul, then per 128-lane window the top-2
(value, global index) pairs, written to HBM as four [Q, W] panels
(W = N/128 windows; ~640 MB at 2.5M x 2048, a ~1 ms write).  Selection
then happens OUTSIDE the kernel on the 128x-smaller window panels:

  1. ``v_k`` = per-query k-th largest window max — a VALID LOWER BOUND on
     the true k-th score (window maxes are a subset of all scores).
  2. windows whose SECOND value >= v_k are "flagged": only they can hide a
     third-or-later member of the true top-k (if a window's 3rd member
     were >= true k-th, its 2nd would be too, and v_k <= true k-th).
     Expected flags/query = same-window top-k pairs ~ C(k,2)/W ~ 0.25.
  3. flagged windows are exactly re-scored (gather 128 rows/window + a
     batched matvec), unflagged windows contribute their max only (their
     2nd member is < v_k <= true k-th, so it cannot be in the top-k), and
     one final selection over [unflagged maxes | rescored rows] yields the
     exact top-k with real global ids.

A static per-query flag budget keeps shapes compile-time constant; the
(rare, tie-heavy) overflow case is detected on the host from the returned
flag count and falls back to the v3 kernel — still exact, just slower.

Tie note: scores come from one source per row (kernel matmul for
unflagged window maxes, XLA matvec for rescored windows); both accumulate
f32 over the same 768-dim contraction on the MXU.  Membership at exact
ties across the two sources assumes consistent accumulation (holds on TPU
for identical contractions; the adversarial tie tests run both paths).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from haconvdr_tpu.ops.topk import _chunk_topk

NEG_INF = float(-jnp.inf)


def _window_top2_kernel(
    n_valid_ref,  # SMEM scalar prefetch: [1] int32
    q_ref,  # [QP, D] VMEM, resident across the whole grid
    p_ref,  # [PT, D] VMEM, streamed per grid step
    v1_ref,  # [128, QP] TRANSPOSED window-max block (flushed every `flush` tiles)
    a1_ref,  # [128, QP] its global row index
    v2_ref,  # [128, QP] window second-max
    a2_ref,  # [128, QP] its global row index
    *,
    pt: int,
    qt: int,
    sw: int,
    flush: int,
):
    # Transposed layout: scores are computed as [pt, qt] so the per-window
    # reductions run along SUBLANES and their [qt]-wide results lie along
    # lanes — the n_win results of a tile stack into one [n_win, qt] store
    # at sublane offset (j % flush) * n_win (provably 8-aligned) and lane
    # offset r0 (a static multiple of qt).  The row-major variant stored
    # single columns at lane offsets Mosaic cannot prove 128-aligned.
    j = pl.program_id(0)
    QP = q_ref.shape[0]
    n_win = pt // sw
    row0 = (j % flush) * n_win

    @pl.when(j % flush == 0)
    def _():
        # a fresh output block may outlive the grid (last, partial flush
        # group): initialize so unwritten rows read as empty
        v1_ref[...] = jnp.full(v1_ref.shape, NEG_INF, jnp.float32)
        v2_ref[...] = jnp.full(v2_ref.shape, NEG_INF, jnp.float32)
        a1_ref[...] = jnp.full(a1_ref.shape, 0, jnp.int32)
        a2_ref[...] = jnp.full(a2_ref.shape, 0, jnp.int32)

    base = j * pt
    nv = n_valid_ref[0]
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, qt), 0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (pt, qt), 0)
    pmat = p_ref[...]
    if pmat.dtype == jnp.int8:
        pmat = pmat.astype(jnp.bfloat16)

    for t in range(QP // qt):
        r0 = t * qt
        s = jax.lax.dot_general(
            pmat,
            q_ref[r0 : r0 + qt, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [PT, qt]
        s = jnp.where(base + row_ids < nv, s, NEG_INF)
        v1s, a1s, v2s, a2s = [], [], [], []
        for g in range(n_win):
            seg = s[g * sw : (g + 1) * sw, :]
            v1 = jnp.max(seg, axis=0)
            l1 = jnp.argmax(seg, axis=0).astype(jnp.int32)
            masked = jnp.where(sub_ids == l1[None, :], NEG_INF, seg)
            v2 = jnp.max(masked, axis=0)
            l2 = jnp.argmax(masked, axis=0).astype(jnp.int32)
            gcol = base + g * sw
            v1s.append(v1)
            a1s.append(gcol + l1)
            v2s.append(v2)
            a2s.append(gcol + l2)
        rows = pl.ds(row0, n_win)
        v1_ref[rows, r0 : r0 + qt] = jnp.stack(v1s, axis=0)
        a1_ref[rows, r0 : r0 + qt] = jnp.stack(a1s, axis=0)
        v2_ref[rows, r0 : r0 + qt] = jnp.stack(v2s, axis=0)
        a2_ref[rows, r0 : r0 + qt] = jnp.stack(a2s, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "q_tile", "p_tile", "q_panel", "seg_width", "budget", "interpret"
    ),
)
def _v4_search(
    queries: jax.Array,  # [Q, D]
    passages: jax.Array,  # [N, D], N % p_tile == 0
    n_valid: jax.Array,  # scalar int32
    k: int,
    q_tile: int = 256,
    p_tile: int = 0,
    q_panel: int = 0,
    seg_width: int = 128,
    budget: int = 8,  # max rescored (flagged) windows per query
    interpret: bool = False,
):
    Q, D = queries.shape
    N, D2 = passages.shape
    assert D == D2
    if (
        passages.dtype in (jnp.bfloat16, jnp.int8)
        and queries.dtype != jnp.bfloat16
    ):
        queries = queries.astype(jnp.bfloat16)
    if p_tile == 0:
        p_tile = 1024
    assert N % p_tile == 0, "pad passages to a multiple of p_tile"
    if q_panel == 0:
        # 1024 for all dtypes: the four [128, panel] output blocks are
        # double-buffered by Mosaic, and a 2048 panel puts the kernel's
        # scoped VMEM right at the 16 MB edge (measured 16.54M OOM); the
        # second panel's extra index stream costs ~4.5 ms bf16 at 2.5M
        q_panel = 1024
    sw = seg_width
    assert p_tile % sw == 0 and sw % 128 == 0
    n_win = p_tile // sw
    assert 128 % n_win == 0
    flush = 128 // n_win
    if Q < q_tile:
        q_tile = max(8, -(-Q // 8) * 8)
    q_panel = max(q_tile, q_panel - q_panel % q_tile)
    q_pad = -Q % q_tile
    if q_pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((q_pad, D), queries.dtype)], axis=0
        )
    Qp = Q + q_pad
    n_tiles = N // p_tile
    Wp = -(-n_tiles // flush) * flush * n_win  # 128-aligned window panels
    nv = jnp.asarray([n_valid], jnp.int32).reshape(1)

    def run_panel(c0: int, c1: int):
        panel = queries[c0:c1]
        QP = panel.shape[0]
        kernel = functools.partial(
            _window_top2_kernel, pt=p_tile, qt=q_tile, sw=sw, flush=flush
        )
        out_spec = pl.BlockSpec((128, QP), lambda j, *_: (j // flush, 0))
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((QP, D), lambda j, *_: (0, 0)),
                    pl.BlockSpec((p_tile, D), lambda j, *_: (j, 0)),
                ],
                out_specs=[out_spec] * 4,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((Wp, QP), jnp.float32),
                jax.ShapeDtypeStruct((Wp, QP), jnp.int32),
                jax.ShapeDtypeStruct((Wp, QP), jnp.float32),
                jax.ShapeDtypeStruct((Wp, QP), jnp.int32),
            ],
            interpret=interpret,
        )(nv, panel, passages)
        return [o.T for o in outs]  # back to [QP, Wp] for selection

    parts = [run_panel(c0, min(c0 + q_panel, Qp)) for c0 in range(0, Qp, q_panel)]
    if len(parts) == 1:
        v1, a1, v2, a2 = parts[0]
    else:
        v1, a1, v2, a2 = (
            jnp.concatenate([p[i] for p in parts]) for i in range(4)
        )

    # ---- selection over the 128x-smaller window panels (pure XLA) ----
    kk = min(k, Wp)
    v_k = _chunk_topk(v1, kk, 128)[0][:, kk - 1]  # [Qp] lower bound on kth
    real_row = (jnp.arange(Qp) < Q)[:, None]  # padded queries: zero rows
    flag = (v2 >= v_k[:, None]) & real_row & jnp.isfinite(v2)
    n_flag_max = jnp.max(jnp.sum(flag, axis=1))

    fw_s, fw = jax.lax.top_k(jnp.where(flag, v2, NEG_INF), budget)  # [Qp, B]
    fvalid = fw_s > NEG_INF
    gidx = fw[:, :, None] * sw + jnp.arange(sw, dtype=jnp.int32)  # [Qp, B, sw]
    safe = jnp.clip(gidx, 0, N - 1).reshape(Qp, budget * sw)
    rows = jnp.take(passages, safe, axis=0)  # [Qp, B*sw, D]
    if rows.dtype == jnp.int8:
        rows = rows.astype(jnp.bfloat16)
    resc = jnp.einsum(
        "qd,qnd->qn",
        queries.astype(rows.dtype),
        rows,
        preferred_element_type=jnp.float32,
    )  # [Qp, B*sw]
    rvalid = fvalid[:, :, None] & (
        gidx < jnp.asarray(n_valid, jnp.int32)
    )
    resc = jnp.where(rvalid.reshape(Qp, -1), resc, NEG_INF)
    ridx = jnp.where(rvalid, gidx, -1).reshape(Qp, -1)

    v1m = jnp.where(flag, NEG_INF, v1)
    a1m = jnp.where(v1m > NEG_INF, a1, -1)
    allv = jnp.concatenate([v1m, resc], axis=1)
    alli = jnp.concatenate([a1m, ridx], axis=1)
    top_s, pos = _chunk_topk(allv, k, 128)
    if top_s.shape[1] < k:  # tiny corpora: pad like the oracle contract
        padc = k - top_s.shape[1]
        top_s = jnp.pad(top_s, ((0, 0), (0, padc)), constant_values=NEG_INF)
        pos = jnp.pad(pos, ((0, 0), (0, padc)))
    top_i = jnp.take_along_axis(alli, pos, axis=1)
    top_i = jnp.where(jnp.isfinite(top_s), top_i, -1)
    return top_s[:Q], top_i[:Q], n_flag_max


def pallas_topk_block_v4(
    queries: jax.Array,
    passages: jax.Array,
    n_valid,
    k: int,
    budget: int = 8,
    interpret: bool = False,
    **kw,
) -> Tuple[jax.Array, jax.Array]:
    """Exact (scores [Q, k], ids [Q, k]) — the v4 fast path with automatic
    v3 fallback when the flagged-window budget overflows (pathological
    same-window tie mass; detected from the returned flag count)."""
    s, i, n_flag = _v4_search(
        queries, passages, jnp.int32(n_valid), k,
        budget=budget, interpret=interpret, **kw,
    )
    if int(n_flag) > budget:
        from haconvdr_tpu.ops.pallas_topk import pallas_topk_block

        return pallas_topk_block(
            queries, passages, jnp.int32(n_valid), k,
            presample=0, interpret=interpret,
        )
    return s, i

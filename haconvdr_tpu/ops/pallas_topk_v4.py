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
does only data-oblivious work — matmul, then per 128-lane window the
(max, its global index, second-max) triple, written to HBM as three
TRANSPOSED [W, Q] panels (W = N/128 windows; ~480 MB at 2.5M x 2048, a
~1 ms write; the transposed layout keeps every store at provably-aligned
offsets and feeds the column-select kernel without 160 MB transposes).
Selection then happens OUTSIDE the kernel on the 128x-smaller panels:

  1. ``v_k`` = per-query k-th largest window max — a VALID LOWER BOUND on
     the true k-th score (window maxes are a subset of all scores) — via
     the column-select kernel (_select_t_kernel; wide XLA top_k at
     [2048, ~20k] measures 20+ ms, the kernel ~1-2 ms).
  2. windows whose SECOND value >= v_k are "flagged": only they can hide a
     third-or-later member of the true top-k (if a window's 3rd member
     were >= true k-th, its 2nd would be too, and v_k <= true k-th).
     Expected flags/query = same-window top-k pairs ~ C(k,2)/W ~ 0.25.
  3. flagged windows are exactly re-scored by the scalar-prefetch gather
     kernel (_rescore_kernel: window ids drive the BlockSpec index maps,
     whole-window DMAs; XLA's gather measured ~38 GB/s here), unflagged
     windows contribute their max only (their 2nd member is < v_k <=
     true k-th, so it cannot be in the top-k), and one final
     column-select over [unflagged maxes | rescored rows] yields the
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

NEG_INF = float(-jnp.inf)


def resolve_select_geometry(
    n_rows: int, index_dtype, seg_width: int = 0, budget: int = 0
) -> Tuple[int, int]:
    """Resolve the (seg_width, budget) window geometry for a v4 search.

    ``seg_width=0`` / ``budget=0`` mean "auto".  Measured on a v5e chip
    at 2.5M x 2048 (probes/probe_v4_segwidth.py, round 5):

    - sw=256 halves every selection panel (Wp = N/sw) and wins ~3-4%:
      int8 37.98 ms (b6) vs 39.51 (sw128 b4); bf16 58.05/58.22 (b6/b8)
      vs 59.84.  It needs p_tile=2048, hence N % 2048 == 0.
    - the flag rate doubles with halved window count (expected
      flags/query ~ C(k,2)/W): budget 4 measured OVERFLOWING for bf16
      (n_flag_max 5), which would trip the ~90 ms v3 fallback — so the
      auto budget rises with sw.  For int8, budget 8 erases the win
      (40.03 ms — a rescore-pool threshold between B*sw=1536 and 2048
      rows) while budget 6 is free (37.98 vs 37.94 at b4), so int8
      gets 6 (headroom 2 over the measured max of 4; P(Pois(0.5) >= 7)
      ~ 1e-6/query) and floats get 8 (+0.17 ms insurance).
    - small blocks: the flag rate scales as 1/W, so wide segments at
      N << 2M overflow any constant budget (measured n_flag 13 at 301k
      with sw=256); they keep (128, 4).
    """
    if seg_width == 0:
        wide = n_rows >= 2_000_000 and n_rows % 2048 == 0
        seg_width = 256 if wide else 128
    if budget == 0:
        if seg_width >= 256:
            budget = 6 if index_dtype == jnp.int8 else 8
        else:
            budget = 4
    return seg_width, budget


def _window_top2_kernel(
    n_valid_ref,  # SMEM scalar prefetch: [1] int32
    q_ref,  # [QP, D] VMEM, resident across the whole grid
    p_ref,  # [PT, D] VMEM, streamed per grid step
    v1_ref,  # [128, QP] TRANSPOSED window-max block (flushed every `flush` tiles)
    a1_ref,  # [128, QP] its global row index
    v2_ref,  # [128, QP] window second-max (its index is never needed:
    # flagged windows are fully re-scored, unflagged v2 never merges)
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

    base = j * pt
    nv = n_valid_ref[0]
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, qt), 0)
    # validity as a [pt, 1] COLUMN vector broadcast into the select: ~1
    # pass over the score area instead of the 2.5 an iota+compare over
    # [pt, qt] costs
    valid = (
        base + jax.lax.broadcasted_iota(jnp.int32, (pt, 1), 0) < nv
    )
    pmat = p_ref[...]
    # int8 x int8 -> int32 MXU mode (both operands quantized): the v5e MXU
    # runs int8 at 2x the bf16 rate, and the 768-term int8 dot is EXACT in
    # int32 (|s| <= 768*127^2 = 12.4M < 2^24), so the window triples cast
    # to f32 losslessly and kernel/rescore consistency is bit-perfect.
    int8_mxu = pmat.dtype == jnp.int8 and q_ref.dtype == jnp.int8
    if pmat.dtype == jnp.int8 and not int8_mxu:
        pmat = pmat.astype(jnp.bfloat16)
    acc = jnp.int32 if int8_mxu else jnp.float32

    for t in range(QP // qt):
        r0 = t * qt
        s = jax.lax.dot_general(
            pmat,
            q_ref[r0 : r0 + qt, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        )  # [PT, qt]
        if int8_mxu:
            # exact int32 -> f32 cast (|s| <= 12.4M < 2^24); Mosaic's
            # reduce-index (argmax) only lowers for f32, and the f32
            # selection path below then applies unchanged
            s = s.astype(jnp.float32)
        s = jnp.where(valid, s, NEG_INF)
        v1s, a1s, v2s = [], [], []
        for g in range(n_win):
            seg = s[g * sw : (g + 1) * sw, :]
            v1 = jnp.max(seg, axis=0)
            l1 = jnp.argmax(seg, axis=0).astype(jnp.int32)
            masked = jnp.where(sub_ids == l1[None, :], NEG_INF, seg)
            v2 = jnp.max(masked, axis=0)
            v1s.append(v1)
            a1s.append(base + g * sw + l1)
            v2s.append(v2)
        rows = pl.ds(row0, n_win)
        v1_ref[rows, r0 : r0 + qt] = jnp.stack(v1s, axis=0)
        a1_ref[rows, r0 : r0 + qt] = jnp.stack(a1s, axis=0)
        v2_ref[rows, r0 : r0 + qt] = jnp.stack(v2s, axis=0)


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
    seg_width: int = 0,  # 0 = auto (resolve_select_geometry)
    budget: int = 0,  # max rescored (flagged) windows per query; 0 =
    # auto.  Expected flags/query ~ Poisson(C(k,2)/W) (same-window
    # top-k pairs): searches whose max flag count exceeds the budget
    # fall back to v3 (still exact).  Each budget slot costs ~0.5 ms of
    # scattered window DMAs at 2.5M x 2048; raise for tie-heavy corpora.
    interpret: bool = False,
):
    Q, D = queries.shape
    N, D2 = passages.shape
    assert D == D2
    seg_width, budget = resolve_select_geometry(
        N, passages.dtype, seg_width, budget
    )
    q_scale = None
    if passages.dtype == jnp.int8 and queries.dtype != jnp.int8:
        # int8 x int8 MXU mode: quantize the (scale-folded) queries with a
        # per-query symmetric scale.  The MXU runs int8 at 2x bf16, and all
        # scores become EXACT int32 integers, so the window-triple/rescore
        # machinery is perfectly self-consistent; the per-query scale is a
        # positive constant per score column, so the top-k order under
        # int8 scoring is scale-invariant and applied only to the returned
        # scores.  vs the previous dequantize-to-bf16 scoring this adds
        # query-side rounding of ~1/254 per element — below the index's
        # own int8 quantization error in the int8 serving mode.
        # (Callers that pre-quantize — pallas_topk_block_v4 does, so its
        # v3 fallback scores the SAME quantized queries — get the raw
        # integer scores back and apply their own scale.)
        qf = queries.astype(jnp.float32)
        q_scale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1), 1e-30)  # [Q]
        queries = (
            jnp.clip(jnp.round(qf / q_scale[:, None] * 127.0), -127, 127)
            .astype(jnp.int8)
        )
    elif passages.dtype == jnp.bfloat16 and queries.dtype != jnp.bfloat16:
        queries = queries.astype(jnp.bfloat16)
    if p_tile == 0:
        # the kernel stacks a tile's n_win window rows into ONE
        # [n_win, qt] store at sublane offset (j % flush) * n_win, which
        # Mosaic requires provably 8-aligned — so n_win = p_tile/sw must
        # be >= 8 (measured: sw=256 at p_tile=1024 fails to compile with
        # "index in dimension 0 is a multiple of 8")
        p_tile = max(1024, 8 * seg_width)
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
    assert interpret or n_win >= 8, (
        f"p_tile/seg_width = {n_win} < 8: Mosaic requires the stacked "
        f"[n_win, qt] window store 8-sublane-aligned; use p_tile >= "
        f"{8 * sw} (interpret mode has no such constraint)"
    )
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
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((QP, D), lambda j, *_: (0, 0)),
                    pl.BlockSpec((p_tile, D), lambda j, *_: (j, 0)),
                ],
                out_specs=[out_spec] * 3,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((Wp, QP), jnp.float32),
                jax.ShapeDtypeStruct((Wp, QP), jnp.int32),
                jax.ShapeDtypeStruct((Wp, QP), jnp.float32),
            ],
            # f32 passages at (sw=256, p_tile=2048, q_panel=1024) sit at
            # the 16 MB scoped-VMEM edge: the same shape compiles at
            # 15.998M inside a scan-fused program but 16.21M as a direct
            # call (XLA placed a panel output in VMEM) — 32 MB keeps the
            # geometry placement-independent (v5e VMEM is 128 MB).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024
            ),
            interpret=interpret,
        )(nv, panel, passages)

    # ---- selection, entirely in the kernel's TRANSPOSED [W, Q] layout —
    # no 160 MB panel transposes (7 ms each), no wide XLA top_k (20+ ms
    # at [2048, ~20k]); the column-select kernel runs the insert
    # machinery on ~1% of the corpus area (~1-2 ms per selection).
    #
    # The pipeline runs PER q-panel part: query columns are independent,
    # and the round-4 in-scan bisect (probes/probe_v4_int8_bisect.py +
    # probe_select_tune.py, NOTES.md) showed the k=100 select costs ~6 ms
    # standalone but 13.4 ms when fed by a [Wp, 2048] concat of the two
    # panel parts — the three 160 MB panel concats dominated the
    # "selection" share.  Selecting per part and concatenating only the
    # [QP, k] outputs removes those concats entirely (and the per-part
    # [Wp, 1024] select itself measured 4.84 vs 5.96 ms).
    kk = min(k, Wp)

    def select_part(v1T, a1T, v2T, c0: int):
        QP = v1T.shape[1]
        # warm-started, 256-wide-segment select (round 5): the admission
        # floor (k-th largest segment max, provably <= the true k-th
        # value) skips the cold-start exactness rounds — measured exact
        # and -15% standalone (probes/probe_select_tune.py warm256)
        v_k = pallas_select_topk_t(
            v1T, kk, rm0=warm_floor(v1T, kk), seg=256, interpret=interpret
        )[0][:, kk - 1]
        # padded queries: zero rows
        real_col = (c0 + jnp.arange(QP) < Q)[None, :]
        flagT = (v2T >= v_k[None, :]) & real_col & jnp.isfinite(v2T)
        n_flag = jnp.max(jnp.sum(flagT, axis=0))

        fw_s, fw = pallas_select_topk_t(
            jnp.where(flagT, v2T, NEG_INF), budget, interpret=interpret
        )  # [QP, B] flagged-window row indices
        fvalid = fw_s > NEG_INF
        win_ids = jnp.clip(fw, 0, Wp - 1).astype(jnp.int32)  # [QP, B]
        starts = win_ids * sw
        # rescore flagged windows via the scalar-prefetch gather kernel:
        # the window ids drive the BlockSpec index maps, so each window
        # arrives as one contiguous [sw, D] DMA (XLA's gather measured
        # ~38 GB/s here)
        resc = _rescore_windows(
            passages, queries[c0 : c0 + QP], win_ids, sw, interpret=interpret
        ).reshape(QP, budget, sw)
        gidx = starts[:, :, None] + jnp.arange(sw, dtype=jnp.int32)
        rvalid = fvalid[:, :, None] & (gidx < jnp.asarray(n_valid, jnp.int32))
        rescT = jnp.where(rvalid, resc, NEG_INF).reshape(QP, budget * sw).T
        ridxT = jnp.where(rvalid, gidx, -1).reshape(QP, budget * sw).T

        v1mT = jnp.where(flagT, NEG_INF, v1T)
        poolT = jnp.concatenate([v1mT, rescT], axis=0)  # [Wp + B*sw, QP]
        idsT = jnp.concatenate(
            [jnp.where(v1mT > NEG_INF, a1T, -1), ridxT], axis=0
        )
        top_s, pos = pallas_select_topk_t(
            poolT, k, rm0=warm_floor(poolT, min(k, poolT.shape[0])),
            seg=256, interpret=interpret,
        )
        if top_s.shape[1] < k:  # tiny corpora: pad like the oracle contract
            padc = k - top_s.shape[1]
            top_s = jnp.pad(
                top_s, ((0, 0), (0, padc)), constant_values=NEG_INF
            )
            pos = jnp.pad(pos, ((0, 0), (0, padc)))
        # ids[q, j] = idsT[pos[q, j], q] — a 200k-element gather, not a
        # full-panel transpose
        top_i = idsT[pos, jnp.arange(QP)[:, None]]
        top_i = jnp.where(jnp.isfinite(top_s), top_i, -1)
        return top_s, top_i, n_flag

    outs = [
        select_part(*run_panel(c0, min(c0 + q_panel, Qp)), c0)
        for c0 in range(0, Qp, q_panel)
    ]
    if len(outs) == 1:
        top_s, top_i, n_flag_max = outs[0]
    else:
        top_s = jnp.concatenate([o[0] for o in outs], axis=0)
        top_i = jnp.concatenate([o[1] for o in outs], axis=0)
        n_flag_max = functools.reduce(jnp.maximum, [o[2] for o in outs])
    top_s = top_s[:Q]
    if q_scale is not None:
        # int8 mode: integer scores -> dequantized f32 (-inf stays -inf)
        top_s = top_s * (q_scale[:Q, None] / 127.0)
    return top_s, top_i[:Q], n_flag_max


def _select_kernel(
    n_valid_ref,  # SMEM scalar prefetch: [1] int32
    s_ref,  # [QP, CT] VMEM: streamed score tile
    out_s_ref,  # [QP, K]
    out_i_ref,  # [QP, K]
    scores,  # [qt, CT] f32 scratch (masked-spill workspace)
    rmin,  # [QP, 1] f32 scratch
    *,
    k: int,
    ct: int,
    qt: int,
    sw: int,
):
    """Exact top-k over PRECOMPUTED scores: the v3 insert machinery with
    the matmul removed — selection cost scales with the score area, which
    for v4's window panels is ~1/128 of the corpus area (wide XLA
    lax.top_k at [2048, ~20k] measures tens of ms; this runs in ~1 ms)."""
    j = pl.program_id(0)
    QP = s_ref.shape[0]
    K = out_s_ref.shape[1]
    n_seg = ct // sw

    @pl.when(j == 0)
    def _():
        out_s_ref[...] = jnp.full(out_s_ref.shape, NEG_INF, jnp.float32)
        rmin[...] = jnp.full(rmin.shape, NEG_INF, jnp.float32)
        out_i_ref[...] = jnp.full(out_i_ref.shape, -1, jnp.int32)

    base = j * ct
    nv = n_valid_ref[0]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (qt, sw), 1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (qt, K), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (qt, ct), 1)

    def extract_insert(seg, g, r0, rm):
        val = jnp.max(seg, axis=1)
        lane = jnp.argmax(seg, axis=1).astype(jnp.int32)
        act = val > rm
        masked = jnp.where(lane_ids == lane[:, None], NEG_INF, seg)
        bs = out_s_ref[r0 : r0 + qt, :]
        amin = jnp.argmin(bs, axis=1).astype(jnp.int32)
        slot = (k_ids == amin[:, None]) & act[:, None]
        out_s_ref[r0 : r0 + qt, :] = jnp.where(slot, val[:, None], bs)
        out_i_ref[r0 : r0 + qt, :] = jnp.where(
            slot, base + g * sw + lane[:, None], out_i_ref[r0 : r0 + qt, :]
        )
        rm = jnp.min(out_s_ref[r0 : r0 + qt, :], axis=1)
        return masked, rm

    for t in range(QP // qt):
        r0 = t * qt
        s = s_ref[r0 : r0 + qt, :].astype(jnp.float32)
        s = jnp.where(base + col_ids < nv, s, NEG_INF)
        rm = rmin[r0 : r0 + qt, 0]
        rem = jnp.full((qt,), NEG_INF, jnp.float32)
        for g in range(n_seg):
            masked, rm = extract_insert(s[:, g * sw : (g + 1) * sw], g, r0, rm)
            scores[:, g * sw : (g + 1) * sw] = masked
            rem = jnp.maximum(rem, jnp.max(masked, axis=1))
        rmin[r0 : r0 + qt, 0] = rm

        def round_body(carry, r0=r0):
            _ = carry
            rm2 = rmin[r0 : r0 + qt, 0]
            rem2 = jnp.full((qt,), NEG_INF, jnp.float32)
            for g in range(n_seg):
                masked, rm2 = extract_insert(
                    scores[:, g * sw : (g + 1) * sw], g, r0, rm2
                )
                scores[:, g * sw : (g + 1) * sw] = masked
                rem2 = jnp.maximum(rem2, jnp.max(masked, axis=1))
            rmin[r0 : r0 + qt, 0] = rm2
            return jnp.any(rem2 > rm2)

        @pl.when(jnp.any(rem > rm))
        def _(round_body=round_body):
            jax.lax.while_loop(lambda c: c, round_body, True)


def pallas_select_topk(
    scores: jax.Array,  # [Q, C] f32
    k: int,
    q_tile: int = 256,
    c_tile: int = 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact (vals [Q, k], col indices [Q, k]) top-k over a score matrix.
    Same contract as ops.topk._chunk_topk; Pallas-fused for TPU."""
    Q, C = scores.shape
    if Q < q_tile:
        q_tile = max(8, -(-Q // 8) * 8)
    q_pad = -Q % q_tile
    if q_pad:
        scores = jnp.concatenate(
            [scores, jnp.full((q_pad, C), NEG_INF, scores.dtype)], axis=0
        )
    Qp = Q + q_pad
    c_tile = min(c_tile, C)
    c_pad = -C % c_tile
    if c_pad:
        scores = jnp.concatenate(
            [scores, jnp.full((Qp, c_pad), NEG_INF, scores.dtype)], axis=1
        )
    Cp = C + c_pad
    K = -(-min(k, C) // 128) * 128
    nv = jnp.asarray([C], jnp.int32)
    kernel = functools.partial(
        _select_kernel, k=k, ct=c_tile, qt=q_tile, sw=128
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Cp // c_tile,),
            in_specs=[pl.BlockSpec((Qp, c_tile), lambda j, *_: (0, j))],
            out_specs=[
                pl.BlockSpec((Qp, K), lambda j, *_: (0, 0)),
                pl.BlockSpec((Qp, K), lambda j, *_: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((q_tile, c_tile), jnp.float32),
                pltpu.VMEM((Qp, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Qp, K), jnp.float32),
            jax.ShapeDtypeStruct((Qp, K), jnp.int32),
        ],
        interpret=interpret,
    )(nv, scores)
    kk = min(k, C)
    top_s, pos = jax.lax.top_k(out_s[:Q], kk)
    top_i = jnp.take_along_axis(out_i[:Q], pos, axis=1)
    return top_s, top_i


def _rescore_kernel(
    starts_ref,  # SMEM prefetch [Qp * B] int32: flagged WINDOW indices
    q_ref,  # (8, D) block: this step's query row group (row j % 8)
    *rest,  # B window blocks (sw, D) + out (8, B*sw)
    budget: int,
    sw: int,
):
    """Data-dependent window rescore: the flagged window ids drive the
    passage BlockSpec index maps (scalar-prefetch gather), so Mosaic DMAs
    whole [sw, D] windows — ~200 KB contiguous each — instead of the
    per-row XLA gather that measures ~38 GB/s (42 ms for B=8 at 2.5M).

    TPU block shapes need 8-row granularity, so query/output blocks hold
    8 consecutive queries and are revisited by 8 grid steps; the step's
    own row is extracted/updated with a masked reduce/select (all offsets
    static — single-row dynamic-sublane ops don't lower)."""
    wrefs, out_ref = rest[:budget], rest[budget]
    j = pl.program_id(0)
    jm = j % 8
    D = q_ref.shape[1]
    row_q = jax.lax.broadcasted_iota(jnp.int32, (8, D), 0)
    qmat = q_ref[...]
    # [1, D] row extract (Mosaic's dot wants 2-D operands with the
    # contraction on the last dim of both — the orientation every other
    # kernel here uses; a 1-D rhs fails to lower)
    q2 = jnp.sum(
        jnp.where(row_q == jm, qmat.astype(jnp.float32), 0.0),
        axis=0,
        keepdims=True,
    ).astype(qmat.dtype)
    row_o = jax.lax.broadcasted_iota(jnp.int32, (8, budget * sw), 0)
    parts = []
    for b in range(budget):
        w = wrefs[b][...]
        int8_mxu = w.dtype == jnp.int8 and q2.dtype == jnp.int8
        if w.dtype == jnp.int8 and not int8_mxu:
            w = w.astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            q2,
            w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if int8_mxu else jnp.float32,
        )  # [1, sw], lane-laid
        if int8_mxu:
            part = part.astype(jnp.float32)  # exact (|s| < 2^24)
        parts.append(part)
    s_row = jnp.concatenate(parts, axis=1)  # [1, B*sw]

    @pl.when(jm == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    out_ref[...] = jnp.where(row_o == jm, s_row, out_ref[...])


def _rescore_windows(
    passages: jax.Array,  # [N, D], N % sw == 0
    queries: jax.Array,  # [Qp, D] (already cast to the matmul dtype)
    win_ids: jax.Array,  # [Qp, B] int32 window indices (clipped valid)
    sw: int,
    interpret: bool = False,
) -> jax.Array:  # [Qp, B*sw] f32 scores
    Qp, D = queries.shape
    assert Qp % 8 == 0
    B = win_ids.shape[1]
    n_win = passages.shape[0] // sw
    starts = jnp.clip(win_ids, 0, n_win - 1).reshape(-1).astype(jnp.int32)

    def win_spec(b):
        return pl.BlockSpec(
            (sw, D), lambda j, starts: (starts[j * B + b], 0)
        )

    in_specs = [pl.BlockSpec((8, D), lambda j, *_: (j // 8, 0))] + [
        win_spec(b) for b in range(B)
    ]
    kernel = functools.partial(_rescore_kernel, budget=B, sw=sw)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Qp,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, B * sw), lambda j, *_: (j // 8, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Qp, B * sw), jnp.float32),
        interpret=interpret,
    )(starts, queries, *([passages] * B))


def _select_t_kernel(
    n_valid_ref,  # SMEM scalar prefetch: [1] int32
    s_ref,  # [CT, QP] VMEM: streamed TRANSPOSED score tile
    rm0_ref,  # [8, QP] VMEM: per-query warm-start admission floor (row 0;
    # -inf when cold) — see pallas_select_topk_t's warm_floor
    out_s_ref,  # [K, QP]
    out_i_ref,  # [K, QP]
    scores,  # [CT, qs] f32 scratch (masked-spill workspace)
    rmin,  # [8, QP] f32 scratch (row 0 used)
    *,
    ct: int,
    qs: int,
    sw: int,
):
    """Column-oriented exact top-k over precomputed [C, Q] scores — the
    v3 insert machinery rotated 90 degrees so it consumes the window
    panels in the kernel's native transposed layout (no 160 MB
    transposes, no wide XLA top_k).

    Warm start (round 5, probes/probe_select_tune.py): the running
    admission threshold ``rm`` is clamped at a caller-provided per-query
    floor.  Any floor <= the true k-th value is EXACT: every final top-k
    member still passes ``val > nextafter_down(floor)``, and the floor
    only prunes values the buffer would have evicted anyway — skipping
    the cold-start exactness rounds (early tiles otherwise admit ~1
    value/segment/round until the buffer fills).  Measured -15% with
    sw=256 at the v4 panel shape, bit-identical scores."""
    j = pl.program_id(0)
    QP = s_ref.shape[1]
    K = out_s_ref.shape[0]
    n_seg = ct // sw

    @pl.when(j == 0)
    def _():
        out_s_ref[...] = jnp.full(out_s_ref.shape, NEG_INF, jnp.float32)
        out_i_ref[...] = jnp.full(out_i_ref.shape, -1, jnp.int32)
        rmin[...] = jnp.broadcast_to(rm0_ref[0:1, :], rmin.shape)

    base = j * ct
    nv = n_valid_ref[0]
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, qs), 0)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (K, qs), 0)
    valid = base + jax.lax.broadcasted_iota(jnp.int32, (ct, 1), 0) < nv

    def extract_insert(seg, g, r0, rm, rm0):
        val = jnp.max(seg, axis=0)
        sub = jnp.argmax(seg, axis=0).astype(jnp.int32)
        act = val > rm
        masked = jnp.where(sub_ids == sub[None, :], NEG_INF, seg)
        bs = out_s_ref[:, r0 : r0 + qs]
        amin = jnp.argmin(bs, axis=0).astype(jnp.int32)
        slot = (k_ids == amin[None, :]) & act[None, :]
        out_s_ref[:, r0 : r0 + qs] = jnp.where(slot, val[None, :], bs)
        out_i_ref[:, r0 : r0 + qs] = jnp.where(
            slot, base + g * sw + sub[None, :], out_i_ref[:, r0 : r0 + qs]
        )
        # clamp at the warm floor: -inf buffer slots must not re-open the
        # admission gate below it
        rm = jnp.maximum(jnp.min(out_s_ref[:, r0 : r0 + qs], axis=0), rm0)
        return masked, rm

    for t in range(QP // qs):
        r0 = t * qs
        rm0 = rm0_ref[0, r0 : r0 + qs]
        s = s_ref[:, r0 : r0 + qs].astype(jnp.float32)
        s = jnp.where(valid, s, NEG_INF)
        rm = rmin[0, r0 : r0 + qs]
        rem = jnp.full((qs,), NEG_INF, jnp.float32)
        for g in range(n_seg):
            masked, rm = extract_insert(
                s[g * sw : (g + 1) * sw, :], g, r0, rm, rm0
            )
            scores[g * sw : (g + 1) * sw, :] = masked
            rem = jnp.maximum(rem, jnp.max(masked, axis=0))
        rmin[0, r0 : r0 + qs] = rm

        def round_body(carry, r0=r0, rm0=rm0):
            _ = carry
            rm2 = rmin[0, r0 : r0 + qs]
            rem2 = jnp.full((qs,), NEG_INF, jnp.float32)
            for g in range(n_seg):
                masked, rm2 = extract_insert(
                    scores[g * sw : (g + 1) * sw, :], g, r0, rm2, rm0
                )
                scores[g * sw : (g + 1) * sw, :] = masked
                rem2 = jnp.maximum(rem2, jnp.max(masked, axis=0))
            rmin[0, r0 : r0 + qs] = rm2
            return jnp.any(rem2 > rm2)

        @pl.when(jnp.any(rem > rm))
        def _(round_body=round_body):
            jax.lax.while_loop(lambda c: c, round_body, True)


def warm_floor(scores_t: jax.Array, k: int) -> jax.Array | None:
    """Per-query EXACT admission floor for :func:`pallas_select_topk_t`:
    the k-th largest 128-row SEGMENT max, nudged one ulp down.  Segment
    maxes are a subset of the column's values, so their k-th largest is
    <= the true k-th value — every final top-k member passes the floor.
    Returns None (cold start) when there are fewer than k segments, where
    that subset argument no longer bounds the k-th value."""
    C, Q = scores_t.shape
    segs = -(-C // 128)
    if k > segs:
        return None
    pad = segs * 128 - C
    v = scores_t
    if pad:
        v = jnp.concatenate(
            [v, jnp.full((pad, Q), NEG_INF, v.dtype)], axis=0
        )
    smax = jnp.max(v.reshape(segs, 128, Q), axis=1)  # [segs, Q]
    kth = jax.lax.top_k(smax.T, k)[0][:, -1]  # [Q]
    return jnp.nextafter(kth, jnp.float32(-jnp.inf))


def pallas_select_topk_t(
    scores_t: jax.Array,  # [C, Q] f32 (transposed layout)
    k: int,
    c_tile: int = 512,  # (c_tile, Q) f32 input tiles are double-buffered:
    # 1024 x 2048 = 8 MB x 2 blows the 16 MB scoped-VMEM limit (measured
    # 17.88M); 512 keeps the whole kernel ~11 MB at Q=2048
    q_sub: int = 256,
    rm0: jax.Array | None = None,  # [Q] f32 warm-start admission floor
    # (warm_floor above; any per-query floor <= the true k-th value is
    # exact).  None = cold start (-inf).
    seg: int = 0,  # insert segment width; 0 = sw_al default (128).  256
    # halves the insert calls per tile — measured exact and -15% with the
    # warm floor at the v4 panel shape (probes/probe_select_tune.py).
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact (vals [Q, kk], ROW indices [Q, kk]) top-k per COLUMN of a
    transposed score matrix; kk = min(k, C), sorted descending."""
    C, Q = scores_t.shape
    kk = min(k, C)
    q_pad = -Q % min(q_sub, max(128, Q))
    if Q < 128:
        q_pad = 128 - Q
    if q_pad:
        scores_t = jnp.concatenate(
            [scores_t, jnp.full((C, q_pad), NEG_INF, scores_t.dtype)], axis=1
        )
    Qp = Q + q_pad
    qs = min(q_sub, Qp)
    sw = seg if seg and C >= seg else sw_al(C)
    c_tile = max(c_tile, sw)
    c_tile = min(c_tile, -(-C // sw) * sw)
    c_tile = max(sw, c_tile - c_tile % sw)
    c_pad = -C % c_tile
    if c_pad:
        scores_t = jnp.concatenate(
            [scores_t, jnp.zeros((c_pad, Qp), scores_t.dtype)], axis=0
        )
    Cp = C + c_pad
    K = max(8, -(-kk // 8) * 8)  # buffer rows: sublane-granular here
    nv = jnp.asarray([C], jnp.int32)
    if rm0 is None:
        rm0 = jnp.full((Q,), NEG_INF, jnp.float32)
    if q_pad:
        rm0 = jnp.concatenate(
            [rm0, jnp.full((q_pad,), NEG_INF, jnp.float32)]
        )
    rm0_in = jnp.broadcast_to(rm0.astype(jnp.float32)[None, :], (8, Qp))
    kernel = functools.partial(_select_t_kernel, ct=c_tile, qs=qs, sw=sw)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Cp // c_tile,),
            in_specs=[
                pl.BlockSpec((c_tile, Qp), lambda j, *_: (j, 0)),
                pl.BlockSpec((8, Qp), lambda j, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((K, Qp), lambda j, *_: (0, 0)),
                pl.BlockSpec((K, Qp), lambda j, *_: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((c_tile, qs), jnp.float32),
                pltpu.VMEM((8, Qp), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((K, Qp), jnp.float32),
            jax.ShapeDtypeStruct((K, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(nv, scores_t, rm0_in)
    # [K, Qp] buffers are tiny (<=128 x Q): transpose + narrow sort
    top_s, pos = jax.lax.top_k(out_s[:, :Q].T, kk)
    top_i = jnp.take_along_axis(out_i[:, :Q].T, pos, axis=1)
    return top_s, top_i


def sw_al(C: int) -> int:
    """Segment width for the transposed select: 128 sublanes, shrunk for
    very small inputs."""
    return 128 if C >= 128 else max(8, -(-C // 8) * 8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "q_tile", "p_tile", "q_panel", "seg_width", "budget", "interpret"
    ),
)
def pallas_topk_block_v4(
    queries: jax.Array,
    passages: jax.Array,
    n_valid,
    k: int,
    q_tile: int = 256,
    p_tile: int = 0,
    q_panel: int = 0,
    seg_width: int = 0,  # 0 = auto (resolve_select_geometry)
    budget: int = 0,  # 0 = auto
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact (scores [Q, k], ids [Q, k]) — the v4 fast path with automatic
    v3 fallback when the flagged-window budget overflows (pathological
    same-window tie mass; detected from the returned flag count).

    The fallback is an IN-GRAPH ``lax.cond``, and the whole wrapper is
    itself jitted (all tuning knobs static): an eager ``lax.cond`` costs
    ~5 s/dispatch on the TPU relay (measured 4,958 ms vs 66 ms jitted at
    2.5M f32 x 2048 — the cond executable's operands include the full
    block), so eager callers like bench.py MUST hit this pre-jitted
    entry.  Nested-jit callers (BlockSearcher's per-block step,
    shard_map bodies) inline it with zero overhead; both kernels compile
    into the program, but only v4 executes unless the budget overflows.

    int8 passages: queries are quantized HERE (per-query symmetric int8)
    so BOTH branches score the same int8 operands — v4 on the int8 MXU
    path, v3 via its exact int8->bf16 upcast (products <= 127^2 from
    exact bf16 inputs accumulate exactly in f32, so the two branches are
    bitwise-consistent integer scores) — and the per-query dequant scale
    is applied once after the cond."""
    from haconvdr_tpu.ops.pallas_topk import pallas_topk_block

    seg_width, budget = resolve_select_geometry(
        passages.shape[0], passages.dtype, seg_width, budget
    )
    q_scale = None
    if passages.dtype == jnp.int8:
        qf = queries.astype(jnp.float32)
        q_scale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1), 1e-30)  # [Q]
        queries = (
            jnp.clip(jnp.round(qf / q_scale[:, None] * 127.0), -127, 127)
            .astype(jnp.int8)
        )

    s, i, n_flag = _v4_search(
        queries, passages, jnp.int32(n_valid), k,
        q_tile=q_tile, p_tile=p_tile, q_panel=q_panel, seg_width=seg_width,
        budget=budget, interpret=interpret,
    )

    def v3_path(_):
        return pallas_topk_block(
            queries, passages, jnp.int32(n_valid), k,
            presample=0, interpret=interpret,
        )

    def v4_path(_):
        return s, i

    s, i = jax.lax.cond(n_flag <= budget, v4_path, v3_path, None)
    if q_scale is not None:
        # integer scores -> dequantized f32 (-inf empty slots stay -inf)
        s = s * (q_scale[:, None] / 127.0)
    return s, i

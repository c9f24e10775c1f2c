"""Pallas TPU kernel: fused exact inner-product top-k.

Replaces faiss ``IndexFlatIP.search`` (src/test_HAConvDR_topiocqa.py:98-108)
with a single fused pass: scores are computed on the MXU and folded into a
running per-query top-k held in VMEM — they NEVER materialize in HBM (the
XLA-level implementation in ops/topk.py writes a [Q, chunk] slab per step;
at 2.5M passages that is ~40 GB of HBM traffic per 2k-query search).

Structure (v3, query-resident): the WHOLE query panel stays resident in
VMEM and the grid is 1-D over passage tiles, so the passage matrix streams
from HBM exactly ONCE per search (the previous 2-D grid re-streamed it per
query tile: 8x the HBM traffic at 2k queries, which was the bf16 wall).
Each grid step re-uses the streamed tile for every query subtile; Mosaic
double-buffers the next tile's DMA under the current tile's compute.

Selection (exact): per query subtile the kernel keeps an UNSORTED best-K
buffer (the VMEM-resident output block itself) plus a row-min cache.  Per
128-lane segment of the score tile it extracts the segment max and inserts
it into the buffer's argmin slot when it beats the row min; the spill of
the extraction-masked segment doubles as the scratch write, and the
remaining-max is accumulated on the way (folded termination — no separate
full-width scan).  Rare contended tiles loop extra rounds over the spilled
scores until no remaining score beats the row min.  Exactness holds for
any insert order because the buffer always retains the K largest values
inserted so far and rounds continue until no remaining score can enter.

Tie-break note: equal scores resolve by extraction order (earlier tile
first, then argmax's lane order), matching the reference's
earlier-block-wins merge (":131-149") at block granularity.

Presample threshold seeding (round 3): OFF by default — implemented,
exactness-proven and tested, but MEASURED NOT WORTH IT.  A pre-pass
scores a ~1.5% per-tile-prefix sample with one XLA matmul and seeds every
buffer slot with each query's k-th sample score minus a safety margin — a
strict lower bound on the true k-th, so exactness holds, and since at
least k block rows beat the seed (the sampled top-k themselves) while
seeds always occupy the buffer argmin, the sliced top-k never contains
the -1 seed sentinel.  On-chip bisection at 2.5M bf16 x 2048 queries:
the seed saves only ~4 ms of kernel time (96 vs 100 ms) — the dynamic
row-min already tightens past any static sample bound after the early
tiles, and the 256-row-lockstep exactness rounds fire on nearly every
(tile, subtile) cell regardless of threshold (some row of the 256 always
has a contended segment) — while the pre-pass itself costs ~33 ms (the
wide sample top-k dominates).  Net: 100 -> 125 ms.  The round-2 ceiling
analysis stands; the structural fix is the v4 window-top-2 kernel
(ops/pallas_topk_v4.py), which removes the insert/round machinery
entirely instead of trying to starve it.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-jnp.inf)


def _topk_kernel(
    n_valid_ref,  # SMEM scalar prefetch: [1] int32
    q_ref,  # [QP, D] VMEM, resident across the whole grid
    p_ref,  # [PT, D] VMEM, streamed per grid step
    *rest,  # [init_ref if seeded,] out_s_ref, out_i_ref, scores, rmin
    k: int,
    pt: int,
    qt: int,
    sw: int,
    seeded: bool = False,
):
    if seeded:
        # init_ref: [QP, K] seed scores (cross-block running thresholds)
        init_ref, out_s_ref, out_i_ref, scores, rmin = rest
    else:
        out_s_ref, out_i_ref, scores, rmin = rest
        init_ref = None
    j = pl.program_id(0)
    QP = q_ref.shape[0]
    K = out_s_ref.shape[1]
    n_seg = pt // sw

    @pl.when(j == 0)
    def _():
        if init_ref is None:
            out_s_ref[...] = jnp.full(out_s_ref.shape, NEG_INF, jnp.float32)
            rmin[...] = jnp.full(rmin.shape, NEG_INF, jnp.float32)
        else:
            # seed the buffer with the running best of PREVIOUS blocks:
            # later blocks then skip the threshold ramp (the reference's
            # per-block faiss search re-pays it every block).  Seed
            # survivors carry id -1 and are re-supplied by the caller's
            # running merge.
            out_s_ref[...] = init_ref[...]
            rmin[...] = jnp.min(init_ref[...], axis=1, keepdims=True)
        out_i_ref[...] = jnp.full(out_i_ref.shape, -1, jnp.int32)

    base = j * pt
    nv = n_valid_ref[0]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (qt, sw), 1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (qt, K), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 1)

    def extract_insert(seg, g, r0, rm):
        """One extraction round on one segment: take the segment max, mask
        it out UNCONDITIONALLY (a row max <= the row min can never enter
        the top-k, so losing it from the workspace is exact), insert into
        the best buffer's argmin slot for rows where it beats the row min;
        returns the masked segment and the updated row-min cache."""
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

    # int8 index tiles upcast once per grid step (halved HBM stream; the
    # per-dim dequant scales are pre-folded into the queries, see
    # index/quantize.py)
    pmat = p_ref[...]
    if pmat.dtype == jnp.int8:
        pmat = pmat.astype(jnp.bfloat16)

    for t in range(QP // qt):
        r0 = t * qt
        s = jax.lax.dot_general(
            q_ref[r0 : r0 + qt, :],
            pmat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qt, PT]
        s = jnp.where(base + col_ids < nv, s, NEG_INF)

        # round 1, straight from registers: the extraction-masked segment
        # write IS the spill, and the remaining-max accumulates on the way
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

        # contended tiles only: several candidates in one sw-lane segment
        @pl.when(jnp.any(rem > rm))
        def _(round_body=round_body):
            jax.lax.while_loop(lambda c: c, round_body, True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "q_tile", "p_tile", "q_panel", "seg_width", "presample", "interpret"
    ),
)
def pallas_topk_block(
    queries: jax.Array,  # [Q, D]
    passages: jax.Array,  # [N, D], N % p_tile == 0
    n_valid: jax.Array,  # scalar int32
    k: int,
    q_tile: int = 256,
    p_tile: int = 0,
    q_panel: int = 0,
    seg_width: int = 0,
    presample: int = 0,  # sample rows per p_tile; 0 off (see docstring)
    init_scores: Optional[jax.Array] = None,  # [Q, >=k] running thresholds
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact (scores [Q, K], indices [Q, K]) top-k, K = k padded to a
    multiple of 128 lanes; callers slice [:, :k] after a final sort.

    ``q_panel`` rows of queries are held VMEM-resident per kernel launch
    (larger panels amortize the single HBM stream over more queries);
    panels beyond that chunk at the XLA level.  Defaults are VMEM-tuned
    for v5e (16 MB): p_tile 1024, panel 2048 rows bf16 / 1024 rows f32.
    bfloat16 passages run the MXU in bf16 (queries are cast to match;
    scores still accumulate in f32)."""
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
        q_panel = 1024 if passages.dtype == jnp.float32 else 2048
    if seg_width == 0:
        seg_width = 128  # measured optimum: wider segments pay cross-tile
        # reduction relayouts in Mosaic that outweigh the per-segment
        # insert-op savings (128: 100 ms; 256: 195 ms; 512: 152 ms at 2.5M)
    assert p_tile % seg_width == 0 and seg_width % 128 == 0
    if Q < q_tile:  # small/online batches: shrink to the 8-sublane floor
        q_tile = max(8, -(-Q // 8) * 8)
    q_panel = max(q_tile, q_panel - q_panel % q_tile)
    q_pad = -Q % q_tile
    if q_pad:  # whole query subtiles; padded rows sliced off below
        queries = jnp.concatenate(
            [queries, jnp.zeros((q_pad, D), queries.dtype)], axis=0
        )
    Qp = Q + q_pad
    K = -(-k // 128) * 128
    nv = jnp.asarray([n_valid], jnp.int32).reshape(1)
    seeded = init_scores is not None
    if seeded:
        init = jnp.full((Qp, K), NEG_INF, jnp.float32)
        init = init.at[:Q, : init_scores.shape[1]].set(
            init_scores.astype(jnp.float32)
        )
    elif presample != 0:
        # threshold pre-pass (see module docstring): one XLA matmul over a
        # per-tile-prefix sample, per-query k-th sample score - margin as a
        # uniform seed.  Auto: 16 rows per 1024-row tile (~1.6%) once the
        # block is big enough for the ramp to matter.
        spp = 16 * max(1, p_tile // 1024) if presample < 0 else presample
        spp = min(spp, p_tile)
        nt = N // p_tile
        if (presample < 0 and N < (1 << 18)) or nt * spp < k:
            seeded = False
        else:
            from haconvdr_tpu.ops.topk import _chunk_topk

            sample = passages.reshape(nt, p_tile, D)[:, :spp, :].reshape(
                nt * spp, D
            )
            if sample.dtype == jnp.int8:
                sample = sample.astype(jnp.bfloat16)
            s_scores = jax.lax.dot_general(
                queries,
                sample,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Qp, S]
            samp_idx = (
                jnp.arange(nt, dtype=jnp.int32)[:, None] * p_tile
                + jnp.arange(spp, dtype=jnp.int32)[None, :]
            ).reshape(-1)
            s_scores = jnp.where(
                samp_idx[None, :] < jnp.asarray(n_valid, jnp.int32),
                s_scores,
                NEG_INF,
            )
            padc = -s_scores.shape[1] % 128
            if padc:
                s_scores = jnp.pad(
                    s_scores, ((0, 0), (0, padc)), constant_values=NEG_INF
                )
            vk = _chunk_topk(s_scores, k, 128)[0][:, k - 1]  # [Qp]
            # margin >> any accumulation-order ulp drift between this
            # matmul and the kernel's; lowering t only costs tightness
            t = vk - (jnp.abs(vk) + 1.0) * 1e-5
            t = jnp.where(jnp.isfinite(vk), t, NEG_INF)
            init = jnp.broadcast_to(t[:, None], (Qp, K)).astype(jnp.float32)
            seeded = True

    def run_panel(c0: int, c1: int) -> Tuple[jax.Array, jax.Array]:
        panel = queries[c0:c1]
        QP = panel.shape[0]
        kernel = functools.partial(
            _topk_kernel, k=k, pt=p_tile, qt=q_tile, sw=seg_width, seeded=seeded
        )
        in_specs = [
            pl.BlockSpec((QP, D), lambda j, *_: (0, 0)),
            pl.BlockSpec((p_tile, D), lambda j, *_: (j, 0)),
        ]
        operands = [nv, panel, passages]
        if seeded:
            in_specs.append(pl.BlockSpec((QP, K), lambda j, *_: (0, 0)))
            operands.append(init[c0:c1])
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N // p_tile,),
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((QP, K), lambda j, *_: (0, 0)),
                    pl.BlockSpec((QP, K), lambda j, *_: (0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((q_tile, p_tile), jnp.float32),
                    pltpu.VMEM((QP, 1), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((QP, K), jnp.float32),
                jax.ShapeDtypeStruct((QP, K), jnp.int32),
            ],
            interpret=interpret,
        )(*operands)

    parts_s, parts_i = [], []
    for c0 in range(0, Qp, q_panel):
        ps, pi = run_panel(c0, min(c0 + q_panel, Qp))
        parts_s.append(ps)
        parts_i.append(pi)
    out_s = parts_s[0] if len(parts_s) == 1 else jnp.concatenate(parts_s)
    out_i = parts_i[0] if len(parts_i) == 1 else jnp.concatenate(parts_i)

    # buffer is unsorted; order + trim to k.  Within a tie class the order
    # follows buffer-slot position (i.e. extraction order), NOT faiss/
    # lax.top_k's lowest-index-first — membership is still exact (see the
    # tie tests in tests/test_pallas_topk.py)
    top_s, pos = jax.lax.top_k(out_s[:Q], k)
    top_i = jnp.take_along_axis(out_i[:Q], pos, axis=1)
    return top_s, top_i


def pallas_supported() -> bool:
    return jax.devices()[0].platform == "tpu"

"""Exact inner-product top-k search, TPU-first.

Replaces faiss ``IndexFlatIP`` + the host-side block loop of the reference
(src/test_HAConvDR_topiocqa.py:39-162).  The reference's per-block
``index.add`` -> GPU GEMM+topk -> host 2-pointer merge becomes:

  * one jit-compiled scan over passage tiles: each step is a single MXU
    matmul Q.P_tile^T followed by an on-tile ``lax.top_k`` and an on-device
    running merge — scores never materialize beyond one [Qc, tile] slab;
  * block-to-block merging also stays on device (:func:`merge_topk`),
    eliminating the reference's CPU merge loop (":131-149");
  * tie-breaking matches the reference merge: earlier blocks / lower
    indices win ties (``merged_list[p1][0] >= cur_list[p2][0]``, ":137").

Compute dtype: scores accumulate in float32; passage/query operands may be
bfloat16 (halves HBM traffic on the bandwidth-bound score pass) — recall
parity is covered by tests and the bf16 path is opt-in.
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-jnp.inf)


def exact_topk_oracle(
    queries: jax.Array, passages: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Reference oracle: full [Q, N] score matrix + top_k.  Test-only."""
    scores = jnp.dot(
        queries.astype(jnp.float32),
        passages.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    return jax.lax.top_k(scores, k)


def merge_topk(
    scores_a: jax.Array,
    idx_a: jax.Array,
    scores_b: jax.Array,
    idx_b: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge two per-query top lists into a global top-k.

    ``lax.top_k`` is stable (lowest position wins ties), so concatenating A
    before B reproduces the reference 2-pointer merge preference for the
    earlier block on equal scores (src/test_HAConvDR_topiocqa.py:137)."""
    s = jnp.concatenate([scores_a, scores_b], axis=1)
    i = jnp.concatenate([idx_a, idx_b], axis=1)
    top_s, pos = jax.lax.top_k(s, k)
    return top_s, jnp.take_along_axis(i, pos, axis=1)


def _chunk_topk(scores: jax.Array, k: int, window: int) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a [Q, C] score tile.

    ``window > 0`` enables the window-max selection: split columns into
    ``window``-wide groups, rank groups by their max, gather the top
    min(k, C/window) whole groups, and take the exact top-k inside them.
    Exactness: any overall top-k element x has <= k-1 elements above it, so
    at most k-1 groups have a larger max than x's group — x's group is
    always selected.  This replaces one O(C)-wide sort-based lax.top_k with
    a cheap VPU max-reduce + two narrow top_ks, the main selection cost on
    TPU (the MXU matmul is not the bottleneck; the wide TopK is).
    """
    Q, C = scores.shape
    if window <= 0 or C <= window * k or C % window != 0:
        return jax.lax.top_k(scores, min(k, C))
    G = C // window
    grouped = scores.reshape(Q, G, window)
    gmax = grouped.max(axis=2)  # [Q, G]
    kw = min(k, G)
    _, gidx = jax.lax.top_k(gmax, kw)  # [Q, kw]
    gathered = jnp.take_along_axis(grouped, gidx[:, :, None], axis=1)  # [Q, kw, window]
    flat = gathered.reshape(Q, kw * window)
    top_s, flat_i = jax.lax.top_k(flat, k)
    col = flat_i % window
    grp = jnp.take_along_axis(gidx, flat_i // window, axis=1)
    return top_s, grp * window + col


@functools.partial(jax.jit, static_argnames=("k", "chunk", "window"))
def topk_block(
    queries: jax.Array,  # [Q, D] float32/bfloat16
    passages: jax.Array,  # [N, D]; N padded to a multiple of ``chunk``
    n_valid: jax.Array,  # scalar int32: true passage count (<= N)
    k: int,
    chunk: int,
    window: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming top-k over one resident passage block.

    Scans ``passages`` in [chunk, D] tiles; each step computes the score
    tile on the MXU, masks padded rows to -inf, takes an exact on-tile
    top-k (window-max selection, see _chunk_topk) and merges into the
    running [Q, k] state.  Peak live memory beyond inputs is one
    [Q, chunk] f32 tile.
    """
    Q = queries.shape[0]
    N, D = passages.shape
    assert N % chunk == 0, "pad passages to a multiple of chunk"
    num_chunks = N // chunk
    tiles = passages.reshape(num_chunks, chunk, D)
    dtype = passages.dtype
    if dtype == jnp.int8:
        # int8 index (index/quantize.py): per-dim scales are pre-folded
        # into the queries by the caller; tiles upcast to bf16 at the MXU
        q = queries.astype(jnp.bfloat16)
    else:
        q = queries.astype(dtype)

    init = (
        jnp.full((Q, k), NEG_INF, jnp.float32),
        jnp.full((Q, k), -1, jnp.int32),
    )

    def step(carry, inp):
        tile, c_idx = inp
        best_s, best_i = carry
        if tile.dtype == jnp.int8:
            tile = tile.astype(q.dtype)
        scores = jax.lax.dot_general(
            q,
            tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Q, chunk]
        base = c_idx * chunk
        col = base + jax.lax.broadcasted_iota(jnp.int32, (Q, chunk), 1)
        scores = jnp.where(col < n_valid, scores, NEG_INF)
        tile_s, tile_i = _chunk_topk(scores, k, window)
        tile_idx = base + tile_i
        if k > tile_s.shape[1]:  # pad tile result up to k columns
            pad = k - tile_s.shape[1]
            tile_s = jnp.pad(tile_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            tile_idx = jnp.pad(tile_idx, ((0, 0), (0, pad)), constant_values=-1)
        # running state first => earlier tiles win ties, faiss-style
        return merge_topk(best_s, best_i, tile_s, tile_idx, k), None

    (best_s, best_i), _ = jax.lax.scan(
        step, init, (tiles, jnp.arange(num_chunks, dtype=jnp.int32))
    )
    return best_s, best_i


def _pad_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    n = x.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return x
    return np.concatenate([x, np.zeros((target - n,) + x.shape[1:], x.dtype)], axis=0)


class BlockSearcher:
    """Searches a stream of passage-embedding blocks, merging on device.

    Equivalent of search_one_by_one_with_faiss
    (src/test_HAConvDR_topiocqa.py:74-162): iterate blocks, top-k per
    block, merge into a running global top-k per query.  Unlike the
    reference the merged list stays at k entries (the reference grows it by
    topN per block but only ever consumes the first topN, ":144-149 vs
    :238-239").
    """

    def __init__(
        self,
        top_k: int = 100,
        passage_chunk: int = 65536,
        query_chunk: int = 1024,
        compute_dtype: str = "float32",
        use_pallas: Optional[bool] = None,
        blocks_per_dispatch: int = 1,
        v4_min_rows: int = 1_500_000,
        superblock_rows: int = 0,
        superblock_dtype: str = "",
        superblock_scale=None,
    ):
        self.top_k = top_k
        self.passage_chunk = passage_chunk
        self.query_chunk = query_chunk
        self.compute_dtype = jnp.dtype(compute_dtype)
        # the unseeded first block routes through the v4 window-top-2
        # kernel only above this size: v4's flagged-window rescore is a
        # fixed ~20-25 ms at Q=2048 (budget x Q window DMAs, independent
        # of N), so it wins big blocks (2.5M: 61 vs 95 ms) and loses
        # small ones (622k fused-stream probe: 153 vs 131 ms/4 blocks);
        # crossover ~1.25M rows
        self.v4_min_rows = v4_min_rows
        # >0: streaming strategy 2 — instead of one seeded search per
        # incoming block (a fixed per-block panel/merge cost), copy
        # blocks into a device-resident [superblock_rows, D] accumulator
        # (donated dynamic_update_slice, ~2.4 ms per 622k f32 block) and
        # run ONE unseeded search per FILLED accumulator, so the corpus
        # is searched at resident speed regardless of how it was
        # blocked.  v4 has no selection ramp to seed, so merging
        # super-block results is exact and costs one lax.top_k.  Pick
        # superblock_rows as large as HBM allows (2048-multiple on the
        # pallas path) and >= v4_min_rows to get the v4 kernel.  int8
        # blocks are DEQUANTIZED into the accumulator's compute dtype
        # (the 4x memory saving does not apply inside the accumulator;
        # int8-resident serving should use ShardedIndex instead).
        self.superblock_rows = superblock_rows
        if superblock_rows:
            mult = 2048 if use_pallas else passage_chunk
            assert superblock_rows % mult == 0, (
                f"superblock_rows must be a multiple of {mult} "
                "(2048 on the pallas path, else passage_chunk)"
            )
        # superblock_dtype="int8": the accumulator itself stays int8 —
        # 4x the rows per fill vs f32 AND the filled buffer searches
        # through v4's int8 x int8 MXU mode (49.8k vs 33.5k QPS at 2.5M).
        # Incoming blocks are REQUANTIZED to one corpus-level per-dim
        # scale (``superblock_scale``, [D] float32 — use
        # EmbeddingBlockStore.global_scale(): the elementwise max of the
        # per-block scales, so requantization never clips); float blocks
        # quantize directly.  Adds <= 0.5 int8-ulp requant rounding on
        # top of the int8 serving model's own error.
        assert superblock_dtype in ("", "int8"), superblock_dtype
        self.superblock_dtype = superblock_dtype
        if superblock_dtype == "int8":
            assert superblock_rows, "superblock_dtype needs superblock_rows"
            self._sb_dt = jnp.dtype(jnp.int8)
            self.superblock_scale = (
                None
                if superblock_scale is None
                else np.asarray(superblock_scale, np.float32)
            )
        else:
            self._sb_dt = jnp.dtype(compute_dtype)
            self.superblock_scale = None
        self._sb_buf = None  # cached (buf, idbuf) accumulator pair
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform == "tpu"
        self.use_pallas = use_pallas
        # >1: lax.scan several equal-shape staged blocks inside ONE jitted
        # dispatch — amortizes the per-execution round-trip (measured
        # ~22 ms on the dev relay) over K blocks.  Only worth it when K
        # blocks fit device memory at once (many small blocks); full-size
        # 2.5M-row blocks should keep K=1.
        self.blocks_per_dispatch = max(1, blocks_per_dispatch)
        if use_pallas:
            assert query_chunk % 128 == 0, "pallas path needs 128-aligned query chunks"
        # remember the exact construction args so with_top_k can clone
        self._init_kw = dict(
            passage_chunk=passage_chunk, query_chunk=query_chunk,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
            blocks_per_dispatch=blocks_per_dispatch, v4_min_rows=v4_min_rows,
            superblock_rows=superblock_rows, superblock_dtype=superblock_dtype,
            superblock_scale=superblock_scale,
        )

        def _one_block(
            best_s, best_ids, queries, passages, ids_arr, n_valid,
            first=False,
        ):
            """One block's whole step — per-query-chunk top-k (threshold-
            seeded on the pallas path), local->global id map (":110") and
            running merge.  ``first`` (static) marks the stream's first
            block: its running best is all -inf, so seeding is useless —
            the unseeded v4 window-top-2 kernel (1.56x v3) runs instead."""
            Q = best_s.shape[0]
            qn = queries.shape[0]
            if self.use_pallas and qn > Q:
                best_s_pad = jnp.concatenate(
                    [best_s, jnp.full((qn - Q, top_k), NEG_INF, jnp.float32)]
                )
            else:
                best_s_pad = best_s
            s_parts, i_parts = [], []
            for qs in range(0, qn, self.query_chunk):
                qe = min(qn, qs + self.query_chunk)
                init = (
                    best_s_pad[qs:qe]
                    if self.use_pallas and not first
                    else None
                )
                s, i = self._block_topk(queries[qs:qe], passages, n_valid, init)
                s_parts.append(s)
                i_parts.append(i)
            block_s = jnp.concatenate(s_parts, axis=0)[:Q]
            block_i = jnp.concatenate(i_parts, axis=0)[:Q]
            # id -1 entries are threshold-seed survivors (or unfilled
            # slots): their scores are dropped here and re-supplied by the
            # running best they came from
            block_ids = ids_arr[jnp.clip(block_i, 0, n_valid - 1)]
            block_ids = jnp.where(block_i >= 0, block_ids, -1)
            block_s = jnp.where(block_i >= 0, block_s, NEG_INF)
            new_s, pos = jax.lax.top_k(
                jnp.concatenate([best_s, block_s], axis=1), top_k
            )
            new_ids = jnp.take_along_axis(
                jnp.concatenate([best_ids, block_ids], axis=1), pos, axis=1
            )
            return new_s, new_ids

        @functools.partial(jax.jit, static_argnames=("first",))
        def _search_block(
            best_s, best_ids, queries, passages, ids_arr, n_valid, first=False
        ):
            return _one_block(
                best_s, best_ids, queries, passages, ids_arr, n_valid,
                first=first,
            )

        @functools.partial(
            jax.jit, static_argnames=("with_scales", "n", "first")
        )
        def _search_blocks(
            best_s, best_ids, queries, *flat, with_scales=False, n=1,
            first=False,
        ):
            """K blocks in one dispatch (unrolled, threshold seeding
            carried through the running best exactly as the
            dispatch-per-block path).  Blocks are passed as SEPARATE
            arrays, not stacked: jnp.stack would copy the whole staged
            set (an extra corpus-sized HBM allocation — OOM at 4 x 622k
            f32 blocks on one chip)."""
            per = 4 if with_scales else 3
            for b in range(n):
                item = flat[b * per : (b + 1) * per]
                if with_scales:
                    emb, ids, nv, sc = item
                    q_eff = queries.astype(jnp.float32) * sc
                else:
                    emb, ids, nv = item
                    q_eff = queries
                best_s, best_ids = _one_block(
                    best_s, best_ids, q_eff, emb, ids, nv,
                    first=first and b == 0,
                )
            return best_s, best_ids

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _sb_insert(buf, idbuf, emb, ids, offset):
            """Copy one (chunk of a) block into the super-block
            accumulator in place (donated buffers -> true XLA aliasing,
            no reallocation); int8 chunks arrive pre-dequantized."""
            buf = jax.lax.dynamic_update_slice(
                buf, emb.astype(buf.dtype),
                (offset, jnp.asarray(0, offset.dtype)),
            )
            idbuf = jax.lax.dynamic_update_slice(idbuf, ids, (offset,))
            return buf, idbuf

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _sb_insert_q(buf, idbuf, emb, ids, offset, factor):
            """int8-accumulator insert: requantize the incoming chunk to
            the corpus-level scale in the same fused dispatch.  ``factor``
            [D] f32 = block_scale/target_scale for int8 code chunks, or
            1/target_scale for float chunks; with target = elementwise
            max of block scales the clip never truncates real values."""
            codes = jnp.clip(
                jnp.round(emb.astype(jnp.float32) * factor), -127, 127
            ).astype(jnp.int8)
            buf = jax.lax.dynamic_update_slice(
                buf, codes, (offset, jnp.asarray(0, offset.dtype))
            )
            idbuf = jax.lax.dynamic_update_slice(idbuf, ids, (offset,))
            return buf, idbuf

        self._search_block = _search_block
        self._search_blocks = _search_blocks
        self._sb_insert = _sb_insert
        self._sb_insert_q = _sb_insert_q
        self._init_best = {}  # (Q,) -> cached (-inf scores, -1 ids) pair

    def _block_topk(self, queries, passages, n_valid, init_scores=None):
        """Per-block exact top-k: fused Pallas kernel on TPU, blocked XLA
        scan elsewhere.  Both are exact; the kernel avoids materializing
        score slabs in HBM (ops/pallas_topk.py).  ``init_scores`` seeds the
        kernel's thresholds with the running best of previous blocks so
        later blocks skip the selection ramp (seed survivors come back
        with id -1 and are dropped at merge)."""
        if self.use_pallas:
            if init_scores is None and passages.shape[0] >= self.v4_min_rows:
                # unseeded (first block / single block), big enough to
                # clear v4's fixed rescore cost: the v4 window-top-2
                # kernel is the fastest exact path (33.5k vs 21.5k QPS
                # at 2.5M); it carries an in-graph lax.cond fallback to
                # v3 on tie overflow
                from haconvdr_tpu.ops.pallas_topk_v4 import (
                    pallas_topk_block_v4,
                )

                return pallas_topk_block_v4(
                    queries, passages, jnp.int32(n_valid), self.top_k
                )
            from haconvdr_tpu.ops.pallas_topk import pallas_topk_block

            return pallas_topk_block(
                queries, passages, jnp.int32(n_valid), self.top_k,
                init_scores=init_scores,
            )
        return topk_block(
            queries, passages, jnp.int32(n_valid), self.top_k, self.passage_chunk
        )

    def with_top_k(self, top_k: int) -> "BlockSearcher":
        """A clone with a different k (k is baked into the jitted merge
        shapes at construction).  Used by the two-stage rescore path to
        oversample the first stage (serve.Retriever).  k > 128 drops to
        the XLA selection — the pallas kernels are k<=~128 designs and
        their selection machinery scales with k (k=500 measured ~20x
        slower than XLA matmul + lax.top_k)."""
        if top_k == self.top_k:
            return self
        kw = dict(self._init_kw)
        if top_k > 128:
            kw["use_pallas"] = False
        return BlockSearcher(top_k=top_k, **kw)

    def search(
        self,
        query_embs: np.ndarray,  # [Q, D]
        blocks: Iterable[Tuple[np.ndarray, ...]],  # (emb [Nb,D], ids [Nb][, scale [D]])
        return_device: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores [Q, k], passage_ids [Q, k]) over all blocks.

        ``ids`` are the per-block embedding->offset arrays (the reference's
        passage_embid_block_*, gen_doc_embeddings.py:133-135); output ids
        are already mapped through them.  Blocks may carry a third element:
        the per-dim dequant scale of an int8 block (index/quantize.py),
        folded into the queries for that block — int8 streaming scores the
        dequantized rows (bf16 query-side rounding, like a bf16 index) at
        half bf16's H2D traffic.
        Device-resident inputs (jax arrays) take a zero-host-copy path;
        ``return_device`` skips the final device->host pull for callers
        that keep consuming on device.
        """
        k = self.top_k
        Q = query_embs.shape[0]
        if Q not in self._init_best:
            # cached per query-count: repeated searches skip two eager
            # device allocations per call (each a relay round-trip here).
            # int32 offsets: corpora up to 2^31 rows (reference max 54.6M)
            self._init_best[Q] = (
                jnp.full((Q, k), NEG_INF, jnp.float32),
                jnp.full((Q, k), -1, jnp.int32),
            )
        best_s, best_ids = self._init_best[Q]

        if isinstance(query_embs, jax.Array):
            q_pad = (-Q % 128) if self.use_pallas else 0
            queries = query_embs.astype(self.compute_dtype)
            if q_pad:
                queries = jnp.concatenate(
                    [queries, jnp.zeros((q_pad, queries.shape[1]), queries.dtype)]
                )
        else:
            queries_np = np.asarray(query_embs)
            if self.use_pallas:  # pallas grid needs whole query tiles
                queries_np = _pad_rows(queries_np, 128)
            queries = jnp.asarray(queries_np, self.compute_dtype)
        row_multiple = 2048 if self.use_pallas else self.passage_chunk

        def to_device(item):
            emb, ids = item[0], item[1]
            scale = item[2] if len(item) > 2 else None
            if emb.dtype == np.int8 and scale is None:
                # scoring raw quantized codes unscaled is silently wrong;
                # int8 blocks must arrive as (emb, ids, scale) triples
                # (store.iter_blocks(with_scales=True))
                raise ValueError(
                    "int8 block without a dequant scale: pass (emb, ids, "
                    "scale) — see index/quantize.py"
                )
            n_valid = emb.shape[0]
            # int8 blocks keep their dtype (the kernels upcast tiles to
            # bf16; compute_dtype would destroy the quantized values)
            blk_dtype = jnp.int8 if emb.dtype == np.int8 else self.compute_dtype
            if isinstance(emb, jax.Array) and n_valid % row_multiple == 0:
                # device-resident block (e.g. freshly encoded, HBM-cached):
                # no host round-trip
                emb_dev = emb.astype(blk_dtype)
            else:
                emb_dev = jnp.asarray(
                    _pad_rows(np.asarray(emb), row_multiple), blk_dtype
                )
            if isinstance(ids, jax.Array):
                if ids.dtype != jnp.int32:
                    # a silent astype would wrap >=2^31 ids into the -1
                    # seed-survivor sentinel range; the host branch below
                    # checks the bound, device arrays can't without a sync
                    raise ValueError(
                        "device-resident block ids must be int32 "
                        f"(got {ids.dtype}); cast on host where the 2^31 "
                        "bound is checked"
                    )
                ids_dev = ids
            else:
                ids = np.asarray(ids)
                assert ids.size == 0 or int(ids.max()) < 2**31, "ids exceed int32"
                ids_dev = jnp.asarray(ids.astype(np.int32))
            scale_dev = None if scale is None else jnp.asarray(scale, jnp.float32)
            # async dispatch: the next block's H2D overlaps the current search
            return (emb_dev, ids_dev, n_valid, scale_dev)

        group: list = []
        dispatched = False  # False until the first search dispatch: the
        # stream's first block is statically unseeded -> v4 kernel

        def flush_group():
            nonlocal best_s, best_ids, dispatched
            if not group:
                return
            first = not dispatched
            if len(group) == 1:
                passages, ids_arr, n_valid, scale_dev = group[0]
                if scale_dev is None:
                    q_eff = queries
                else:  # fold the int8 block's dequant scale into the queries
                    q_eff = queries.astype(jnp.float32) * scale_dev
                best_s, best_ids = self._search_block(
                    best_s, best_ids, q_eff, passages, ids_arr,
                    jnp.int32(n_valid), first=first,
                )
            else:  # fused dispatch over K equal-shape blocks
                with_scales = group[0][3] is not None
                flat = []
                for emb, ids, nv, sc in group:
                    flat.extend([emb, ids, jnp.int32(nv)])
                    if with_scales:
                        flat.append(sc)
                best_s, best_ids = self._search_blocks(
                    best_s, best_ids, queries, *flat,
                    with_scales=with_scales, n=len(group), first=first,
                )
            dispatched = True
            group.clear()

        if self.superblock_rows:
            best_s, best_ids = self._stream_superblocks(
                queries, blocks, best_s, best_ids
            )
        else:
            it = iter(blocks)
            nxt = next(it, None)
            staged = to_device(nxt) if nxt is not None else None
            while staged is not None:
                item = staged
                nxt = next(it, None)
                staged = to_device(nxt) if nxt is not None else None
                if group and (
                    item[0].shape != group[0][0].shape
                    or (item[3] is None) != (group[0][3] is None)
                ):
                    flush_group()  # ragged tail / mixed quantization: own group
                group.append(item)
                if len(group) >= self.blocks_per_dispatch:
                    flush_group()
            flush_group()

        if return_device:
            return best_s, best_ids
        return np.asarray(best_s), np.asarray(best_ids)

    def _stream_superblocks(self, queries, blocks, best_s, best_ids):
        """Streaming strategy 2 (``superblock_rows``): accumulate incoming
        blocks into one device-resident buffer and search each FILLED
        buffer once, unseeded, at full resident speed (v4 above
        v4_min_rows).  Replaces the reference's per-block faiss loop
        (src/test_HAConvDR_topiocqa.py:77-149) with resident-speed search
        plus ~ms device copies; exact regardless of block boundaries.
        ``queries`` arrive already padded/cast by search()."""
        C = self.superblock_rows
        buf = idbuf = None
        fill = 0
        int8_acc = self.superblock_dtype == "int8"
        if int8_acc:
            if self.superblock_scale is None:
                raise ValueError(
                    "superblock_dtype='int8' needs superblock_scale "
                    "([D] per-dim corpus scale — "
                    "EmbeddingBlockStore.global_scale())"
                )
            tscale = jnp.asarray(self.superblock_scale, jnp.float32)
            q_sb = queries.astype(jnp.float32) * tscale  # fold once

        def flush(best_s, best_ids, n_valid):
            # unseeded (first=True): v4 needs no threshold ramp, and the
            # running best merges exactly inside _one_block
            return self._search_block(
                best_s, best_ids, q_sb if int8_acc else queries, buf, idbuf,
                jnp.int32(n_valid), first=True,
            )

        for item in blocks:
            emb, ids = item[0], item[1]
            scale = item[2] if len(item) > 2 else None
            is_int8 = (
                emb.dtype == jnp.int8
                if isinstance(emb, jax.Array)
                else emb.dtype == np.int8
            )
            if is_int8 and scale is None:
                raise ValueError(
                    "int8 block without a dequant scale: pass (emb, ids, "
                    "scale) — see index/quantize.py"
                )
            if not isinstance(emb, jax.Array):
                emb = jnp.asarray(emb)
            factor = None
            if int8_acc:  # requantize to the corpus scale inside insert
                factor = (
                    jnp.asarray(scale, jnp.float32) / tscale
                    if is_int8
                    else 1.0 / tscale
                )
            elif is_int8:  # dequantize into the accumulator's dtype
                emb = emb.astype(jnp.float32) * jnp.asarray(scale, jnp.float32)
            if isinstance(ids, jax.Array):
                if ids.dtype != jnp.int32:
                    raise ValueError(
                        "device-resident block ids must be int32 "
                        f"(got {ids.dtype}); cast on host where the 2^31 "
                        "bound is checked"
                    )
            else:
                ids = np.asarray(ids)
                assert ids.size == 0 or int(ids.max()) < 2**31, "ids exceed int32"
                ids = jnp.asarray(ids.astype(np.int32))
            if buf is None:
                D = emb.shape[1]
                cached = self._sb_buf
                if cached is not None and cached[0].shape == (C, D) and (
                    cached[0].dtype == self._sb_dt
                ):
                    buf, idbuf = cached  # rows beyond fill are masked by
                    # n_valid at search time, so stale content is harmless
                else:
                    buf = jnp.zeros((C, D), self._sb_dt)
                    idbuf = jnp.full((C,), -1, jnp.int32)
                self._sb_buf = None  # consumed (inserts donate it)
            off = 0
            n = emb.shape[0]
            while off < n:
                take = min(C - fill, n - off)
                if off == 0 and take == n:  # whole block: skip the slice
                    e_c, i_c = emb, ids  # (one less eager dispatch)
                else:
                    e_c = emb[off : off + take]
                    i_c = ids[off : off + take]
                if int8_acc:
                    buf, idbuf = self._sb_insert_q(
                        buf, idbuf, e_c, i_c, jnp.int32(fill), factor
                    )
                else:
                    buf, idbuf = self._sb_insert(
                        buf, idbuf, e_c, i_c, jnp.int32(fill),
                    )
                fill += take
                off += take
                if fill == C:
                    best_s, best_ids = flush(best_s, best_ids, C)
                    fill = 0
        if fill > 0:
            best_s, best_ids = flush(best_s, best_ids, fill)
        if buf is not None:
            self._sb_buf = (buf, idbuf)  # reuse across search() calls
        return best_s, best_ids

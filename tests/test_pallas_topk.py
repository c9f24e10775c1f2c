"""Pallas fused top-k kernel: interpret-mode oracle tests (real-TPU perf is
covered by bench.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from haconvdr_tpu.ops.pallas_topk import pallas_topk_block
from haconvdr_tpu.ops.topk import BlockSearcher, exact_topk_oracle, topk_block


def _run(q, p, n_valid, k, **kw):
    return pallas_topk_block(
        jnp.asarray(q), jnp.asarray(p), jnp.int32(n_valid), k, interpret=True, **kw
    )


def test_pallas_matches_oracle(rng):
    Q, N, D, k = 128, 1024, 32, 10
    q = rng.randn(Q, D).astype(np.float32)
    p = rng.randn(N, D).astype(np.float32)
    s, i = _run(q, p, N, k, q_tile=64, p_tile=256)
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_pallas_respects_n_valid(rng):
    Q, N, D, k = 64, 512, 16, 7
    q = rng.randn(Q, D).astype(np.float32)
    p = rng.randn(N, D).astype(np.float32)
    # make padded rows the would-be winners
    p[400:] *= 100.0
    s, i = _run(q, p, 400, k, q_tile=64, p_tile=128)
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p[:400]), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_pallas_duplicate_scores(rng):
    """Rows with many exact duplicates exercise repeated extraction."""
    Q, N, D, k = 64, 256, 8, 12
    q = np.ones((Q, D), np.float32)
    p = np.repeat(rng.randn(32, D).astype(np.float32), 8, axis=0)  # 8 copies each
    s, i = _run(q, p, N, k, q_tile=64, p_tile=128)
    rs, _ = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    # all returned indices must point at passages with the right score
    full = q @ p.T
    for r in range(Q):
        np.testing.assert_allclose(
            full[r, np.asarray(i)[r]], np.asarray(s)[r], rtol=1e-5
        )


def test_block_searcher_pallas_flag_matches_xla(rng):
    Q, N, D, k = 16, 700, 16, 9
    q = rng.randn(Q, D).astype(np.float32)
    p = rng.randn(N, D).astype(np.float32)
    ids = np.arange(N, dtype=np.int64) * 3
    xla = BlockSearcher(top_k=k, passage_chunk=128, use_pallas=False)
    s1, i1 = xla.search(q, [(p, ids)])
    # interpret-mode pallas through the same front door
    import haconvdr_tpu.ops.topk as m

    pal = BlockSearcher(top_k=k, passage_chunk=128, use_pallas=True, query_chunk=128)

    def fake_block(qq, pp, nv, init_scores=None):
        return pallas_topk_block(
            qq, pp, jnp.int32(nv), k, q_tile=128, p_tile=256,
            init_scores=init_scores, interpret=True,
        )

    pal._block_topk = fake_block
    s2, i2 = pal.search(q, [(p, ids)])
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
    np.testing.assert_array_equal(i1, i2)


def test_fused_attention_interpret_matches_xla(rng):
    import math

    from haconvdr_tpu.ops.fused_attention import fused_attention

    B, H, L, d = 2, 3, 128, 64
    q = rng.randn(B, H, L, d).astype(np.float32)
    k = rng.randn(B, H, L, d).astype(np.float32)
    v = rng.randn(B, H, L, d).astype(np.float32)
    mask = np.ones((B, L), np.int32)
    mask[:, 100:] = 0

    out = np.asarray(
        fused_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
            interpret=True,
        )
    )
    bias = (1.0 - mask.astype(np.float32))[:, None, None, :] * -1e9
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d) + bias
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_encoder_flash_flag_matches_exact(rng):
    from haconvdr_tpu.config import ModelConfig
    from haconvdr_tpu.models.encoder import encode, init_encoder_params

    # interpret-mode pallas isn't routed through encode(); on CPU the flag
    # path would invoke a TPU kernel, so emulate by checking flag fallback:
    # with dropout rng present the exact path is used regardless of flag.
    cfg = ModelConfig.tiny()
    cfg.use_flash_attention = True
    cfg.hidden_dropout_prob = 0.0
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.randint(4, cfg.vocab_size, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    # L=8 unsupported by the kernel -> exercised only on TPU shapes; here we
    # just assert the support predicate gates correctly (platform gate:
    # always False on the CPU test mesh so use_flash can default on)
    from haconvdr_tpu.ops.fused_attention import fused_attention_supported

    assert not fused_attention_supported(8, 8)
    assert not fused_attention_supported(384, 64)  # CPU mesh
    import jax as _jax

    if _jax.devices()[0].platform == "tpu":  # pragma: no cover
        assert fused_attention_supported(384, 64)
        assert fused_attention_supported(512, 64)


def test_block_searcher_seeded_multiblock_exact(rng):
    """Cross-block threshold seeding: a 3-block seeded search must equal
    the oracle over the concatenated corpus (seed survivors dropped at
    merge and re-supplied by the running best)."""
    Q, D, k = 32, 16, 11
    q = rng.randn(Q, D).astype(np.float32)
    sizes = [300, 256, 128]
    blocks_np = [rng.randn(n, D).astype(np.float32) for n in sizes]
    ids, base = [], 0
    for n in sizes:
        ids.append(np.arange(base, base + n, dtype=np.int64))
        base += n
    pal = BlockSearcher(top_k=k, query_chunk=128, use_pallas=True)

    def fake_block(qq, pp, nv, init_scores=None):
        return pallas_topk_block(
            qq, pp, jnp.int32(nv), k, q_tile=32, p_tile=128,
            init_scores=init_scores, interpret=True,
        )

    pal._block_topk = fake_block
    s, i = pal.search(q, list(zip(blocks_np, ids)))
    all_p = np.concatenate(blocks_np)
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(all_p), k)
    np.testing.assert_allclose(s, np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(i, np.asarray(ri))


def test_pallas_v2_stream_matches_oracle(rng):
    from haconvdr_tpu.ops.pallas_topk_v2 import pallas_topk_block_v2

    Q, N, D, k = 100, 1024, 32, 10
    q = rng.randn(Q, D).astype(np.float32)
    p = rng.randn(N, D).astype(np.float32)
    s, i = pallas_topk_block_v2(
        jnp.asarray(q), jnp.asarray(p), jnp.int32(900), k,
        q_tile=64, p_chunk=128, interpret=True,
    )
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p[:900]), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_bf16_quantized_tie_pid_sets(rng):
    """Deliberate score collisions (VERDICT r1 item 9): bf16-quantized
    embeddings duplicated across pids make exact ties that span passage
    tiles and blocks.  All three implementations (pallas kernel, XLA scan
    path, full-matrix oracle) must return identical score vectors, and
    every returned pid must belong to the tie class of its score — the
    *membership* contract ties can't break.  Order *within* a tie class is
    implementation-defined (kernel: extraction order; XLA/oracle: stable
    lowest-index-first), so pid sets are compared per tie class, not
    positionally."""
    Q, D, k = 32, 16, 10
    n_base, n_rep = 24, 16  # 24 tie classes x 16 pids each
    base = rng.randn(n_base, D).astype(np.float32)
    # quantize to bf16-representable values; compute stays f32 so equal
    # rows produce bit-equal scores
    base = np.asarray(jnp.asarray(base, jnp.bfloat16).astype(jnp.float32))
    p = np.repeat(base, n_rep, axis=0)
    perm = rng.permutation(p.shape[0])  # spread tie classes across tiles
    p = np.ascontiguousarray(p[perm])
    q = rng.randn(Q, D).astype(np.float32)
    q = np.asarray(jnp.asarray(q, jnp.bfloat16).astype(jnp.float32))
    N = p.shape[0]
    full = q @ p.T  # ground-truth score matrix

    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p), k)
    xs, xi = topk_block(jnp.asarray(q), jnp.asarray(p), jnp.int32(N), k, chunk=128)
    ks_, ki = _run(q, p, N, k, q_tile=32, p_tile=128)

    rs, xs, ks_ = np.asarray(rs), np.asarray(xs), np.asarray(ks_)
    ri, xi, ki = np.asarray(ri), np.asarray(xi), np.asarray(ki)
    # ties are exact, so the three score vectors must be bit-identical
    np.testing.assert_array_equal(xs, rs)
    np.testing.assert_array_equal(ks_, rs)
    # XLA scan path is stable top_k over ascending indices == oracle order
    np.testing.assert_array_equal(xi, ri)
    for r in range(Q):
        for impl_i in (ri, xi, ki):
            # membership: every returned pid's true score equals the
            # returned score at its rank
            np.testing.assert_array_equal(full[r, impl_i[r]], rs[r])
        # per tie class, the kernel may order members differently but must
        # return the same *number* of members as the oracle (exactness at
        # the truncation boundary)
        for v in np.unique(rs[r]):
            cls = set(np.flatnonzero(full[r] == v))
            kern = [i for i in ki[r] if full[r, i] == v]
            orac = [i for i in ri[r] if full[r, i] == v]
            assert len(kern) == len(orac)
            assert set(kern) <= cls and len(set(kern)) == len(kern)


def test_cross_block_tie_earlier_block_wins(rng):
    """A tie class split across two blocks with k smaller than the class:
    the reference's 2-pointer merge keeps the earlier block's entries
    (src/test_HAConvDR_topiocqa.py:137); BlockSearcher must do the same on
    the XLA path.  The pallas seeded path drops seed survivors to id -1
    and re-ranks through the same stable merge, so it must agree on the
    pid set too."""
    D, k = 8, 4
    row = rng.randn(D).astype(np.float32)
    # 6 identical rows per block -> 12-way tie, only 4 slots
    blk = np.tile(row, (6, 1))
    filler_a = rng.randn(122, D).astype(np.float32) * 0.01
    filler_b = rng.randn(122, D).astype(np.float32) * 0.01
    pa = np.concatenate([blk, filler_a])
    pb = np.concatenate([blk, filler_b])
    ids_a = np.arange(128, dtype=np.int64)
    ids_b = np.arange(128, 256, dtype=np.int64)
    q = row[None, :].copy()

    xla = BlockSearcher(top_k=k, passage_chunk=128, use_pallas=False)
    s1, i1 = xla.search(q, [(pa, ids_a), (pb, ids_b)])
    # all four winners come from block A (ids 0..5), lowest-index-first
    np.testing.assert_array_equal(i1[0], [0, 1, 2, 3])

    pal = BlockSearcher(top_k=k, query_chunk=128, use_pallas=True)

    def fake_block(qq, pp, nv, init_scores=None):
        return pallas_topk_block(
            qq, pp, jnp.int32(nv), k, q_tile=128, p_tile=128,
            init_scores=init_scores, interpret=True,
        )

    pal._block_topk = fake_block
    s2, i2 = pal.search(q, [(pa, ids_a), (pb, ids_b)])
    # ties are exact WITHIN each implementation (identical rows -> identical
    # scores); across implementations the accumulation order differs
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
    assert len(set(np.round(s2[0], 4))) == 1  # still a 4-way tie in-impl
    # kernel extraction order within block A may differ, but the winner
    # set must still be block-A members of the tie class
    assert set(i2[0]) <= set(range(6))
    assert len(set(i2[0])) == k


def test_pallas_presample_matches_oracle(rng):
    """Threshold pre-pass seeding (round-3): forced on at small scale, the
    result must still be the exact oracle top-k with all-real ids."""
    Q, N, D, k = 128, 2048, 32, 10
    q = rng.randn(Q, D).astype(np.float32)
    p = rng.randn(N, D).astype(np.float32)
    s, i = _run(q, p, N, k, q_tile=64, p_tile=256, presample=64)
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    assert np.all(np.asarray(i) >= 0)


def test_pallas_presample_ties_and_n_valid(rng):
    """Presample + heavy exact ties + padded invalid rows that would win:
    membership must match the oracle over the valid prefix, with no seed
    sentinels leaking into the sliced top-k."""
    Q, D, k = 32, 16, 8
    n_base, n_rep = 16, 16
    base = rng.randn(n_base, D).astype(np.float32)
    base = np.asarray(jnp.asarray(base, jnp.bfloat16).astype(jnp.float32))
    p = np.repeat(base, n_rep, axis=0)
    p = np.ascontiguousarray(p[rng.permutation(p.shape[0])])
    n_valid = 200
    p[n_valid:] *= 50.0  # invalid rows would dominate if unmasked
    q = rng.randn(Q, D).astype(np.float32)
    s, i = _run(q, p, n_valid, k, q_tile=32, p_tile=128, presample=32)
    rs, _ = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p[:n_valid]), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    i = np.asarray(i)
    assert np.all((i >= 0) & (i < n_valid))
    full = q @ p[:n_valid].T
    for r in range(Q):
        np.testing.assert_allclose(
            full[r, i[r]], np.asarray(s)[r], rtol=1e-5
        )


def test_pallas_presample_uniform_corpus(rng):
    """Adversarial for seeding: every row identical (one giant tie class).
    The proof obligation is that seeds are always evicted before the
    sliced top-k — ids must be real rows even when all scores equal the
    sample threshold's source value."""
    Q, N, D, k = 16, 1024, 8, 6
    row = rng.randn(D).astype(np.float32)
    p = np.tile(row, (N, 1))
    q = rng.randn(Q, D).astype(np.float32)
    s, i = _run(q, p, N, k, q_tile=16, p_tile=256, presample=16)
    i = np.asarray(i)
    assert np.all((i >= 0) & (i < N))
    expect = (q @ row)[:, None]
    np.testing.assert_allclose(np.asarray(s), np.tile(expect, (1, k)), rtol=1e-5)
    for r in range(Q):
        assert len(set(i[r])) == k


def test_pallas_int8_matches_dequantized_oracle(rng):
    """int8 index tiles (index/quantize.py): the kernel upcasts to bf16 in
    VMEM; with the per-dim scale pre-folded into the queries the result is
    exact w.r.t. the dequantized rows."""
    from haconvdr_tpu.index.quantize import quantize_int8

    Q, N, D, k = 64, 1024, 32, 10
    emb = rng.randn(N, D).astype(np.float32)
    queries = rng.randn(Q, D).astype(np.float32)
    int8_rows, scale = quantize_int8(emb)
    q_folded = (queries * scale[None, :]).astype(np.float32)
    s, i = _run(q_folded, int8_rows, N, k, q_tile=64, p_tile=256)
    qf = jnp.asarray(q_folded, jnp.bfloat16).astype(jnp.float32)
    full = jnp.dot(qf, jnp.asarray(int8_rows, jnp.float32).T)
    rs, ri = jax.lax.top_k(full, k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_pallas_v4_matches_oracle(rng):
    """v4 window-top-2 kernel (ops/pallas_topk_v4.py): oracle equality on
    random data, n_valid masking, and exact ids."""
    from haconvdr_tpu.ops.pallas_topk_v4 import pallas_topk_block_v4

    Q, N, D, k = 128, 2048, 32, 10
    q = rng.randn(Q, D).astype(np.float32)
    p = rng.randn(N, D).astype(np.float32)
    s, i = pallas_topk_block_v4(
        jnp.asarray(q), jnp.asarray(p), N, k,
        q_tile=64, p_tile=256, interpret=True,
    )
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))

    p2 = p.copy()
    p2[1500:] *= 100.0  # padded rows would win if unmasked
    s, i = pallas_topk_block_v4(
        jnp.asarray(q), jnp.asarray(p2), 1500, k,
        q_tile=64, p_tile=256, interpret=True,
    )
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p2[:1500]), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_pallas_v4_multipart_panels_exact(rng):
    """Force the q_panel split (Q > q_panel -> two panel parts) so the
    per-part selection pipeline (round-4 restructure: v_k/flag/rescore/
    final select run per part, only [QP, k] outputs concatenated) is
    exercised: results must equal the oracle across the part boundary,
    including n_valid masking in the second part's columns."""
    from haconvdr_tpu.ops.pallas_topk_v4 import pallas_topk_block_v4

    Q, N, D, k = 256, 1024, 16, 7
    q = rng.randn(Q, D).astype(np.float32)
    p = rng.randn(N, D).astype(np.float32)
    s, i = pallas_topk_block_v4(
        jnp.asarray(q), jnp.asarray(p), N, k,
        q_tile=128, q_panel=128, p_tile=256, interpret=True,
    )
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))

    p2 = p.copy()
    p2[900:] *= 100.0  # padded rows would win in BOTH parts if unmasked
    s, i = pallas_topk_block_v4(
        jnp.asarray(q), jnp.asarray(p2), 900, k,
        q_tile=128, q_panel=128, p_tile=256, interpret=True,
    )
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p2[:900]), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_pallas_v4_rescore_path_exact(rng):
    """Force same-window top-k pairs (the flagged-rescore path) by packing
    near-duplicate high-scoring rows into adjacent slots: results must
    still be the exact oracle."""
    from haconvdr_tpu.ops.pallas_topk_v4 import _v4_search, pallas_topk_block_v4

    Q, N, D, k = 32, 1024, 16, 8
    q = rng.randn(Q, D).astype(np.float32)
    p = rng.randn(N, D).astype(np.float32) * 0.01
    # plant pairs of strong rows inside the same 128-lane window
    for w in range(4):
        base = w * 256
        strong = rng.randn(D).astype(np.float32)
        p[base] = strong
        p[base + 1] = strong * 0.999
    s, i, nf = _v4_search(
        jnp.asarray(q), jnp.asarray(p), jnp.int32(N), k,
        q_tile=32, p_tile=256, budget=8, interpret=True,
    )
    assert 1 <= int(nf) <= 8  # the rescore path genuinely fired, in budget
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_pallas_v4_tie_overflow_falls_back(rng):
    """A uniform corpus floods the flag budget; the host fallback to v3
    must keep membership exact with real ids."""
    from haconvdr_tpu.ops.pallas_topk_v4 import _v4_search, pallas_topk_block_v4

    Q, N, D, k = 16, 2048, 8, 6
    row = rng.randn(D).astype(np.float32)
    p = np.tile(row, (N, 1))
    q = rng.randn(Q, D).astype(np.float32)
    _, _, nf = _v4_search(
        jnp.asarray(q), jnp.asarray(p), jnp.int32(N), k,
        q_tile=16, p_tile=256, interpret=True,
    )
    assert int(nf) > 8  # budget genuinely overflows
    s, i = pallas_topk_block_v4(
        jnp.asarray(q), jnp.asarray(p), N, k,
        q_tile=16, p_tile=256, interpret=True,
    )
    i = np.asarray(i)
    assert np.all((i >= 0) & (i < N))
    expect = (q @ row)[:, None]
    np.testing.assert_allclose(np.asarray(s), np.tile(expect, (1, k)), rtol=1e-5)
    for r in range(Q):
        assert len(set(i[r])) == k


def _int8_mxu_oracle(q_folded, int8_rows, k):
    """The v4 int8 x int8 scoring model: per-query symmetric query
    quantization, exact int32 scores, dequantized by q_scale/127.
    Returns (top scores, top ids, full integer score matrix)."""
    qf = q_folded.astype(np.float32)
    q_scale = np.maximum(np.abs(qf).max(axis=1), 1e-30)
    qq = np.clip(np.round(qf / q_scale[:, None] * 127.0), -127, 127)
    full_int = qq.astype(np.int32) @ int8_rows.astype(np.int32).T
    full = full_int.astype(np.float32) * (q_scale[:, None] / 127.0)
    rs, ri = jax.lax.top_k(jnp.asarray(full), k)
    return rs, ri, full_int


def _assert_int8_topk(s, i, rs, ri, full_int):
    """Integer scoring makes exact ties common: assert score vectors
    equal and each returned id is a valid member of its tie class
    (its integer score matches the oracle's at that rank)."""
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    i, ri = np.asarray(i), np.asarray(ri)
    for r in range(i.shape[0]):
        assert len(set(i[r])) == i.shape[1], "duplicate ids in one row"
        np.testing.assert_array_equal(
            full_int[r, i[r]], full_int[r, ri[r]]
        )


def test_pallas_v4_int8(rng):
    """int8 index through v4 at a tie-heavy shape (k=10 over 8 windows
    overflows the flag budget -> v3 fallback): the fallback must score
    the SAME quantized queries, so the int8 x int8 oracle still holds."""
    from haconvdr_tpu.index.quantize import quantize_int8
    from haconvdr_tpu.ops.pallas_topk_v4 import pallas_topk_block_v4

    Q, N, D, k = 64, 1024, 32, 10
    emb = rng.randn(N, D).astype(np.float32)
    queries = rng.randn(Q, D).astype(np.float32)
    int8_rows, scale = quantize_int8(emb)
    q_folded = (queries * scale[None, :]).astype(np.float32)
    s, i = pallas_topk_block_v4(
        jnp.asarray(q_folded), jnp.asarray(int8_rows), N, k,
        q_tile=64, p_tile=256, interpret=True,
    )
    rs, ri, full_int = _int8_mxu_oracle(q_folded, int8_rows, k)
    _assert_int8_topk(s, i, rs, ri, full_int)


def test_pallas_v4_int8_mxu_fast_path(rng):
    """int8 x int8 MXU mode through the v4 fast path proper (flag count
    within budget, asserted via _v4_search's returned n_flag): scores
    equal the exact integer oracle, ids exact."""
    from haconvdr_tpu.index.quantize import quantize_int8
    from haconvdr_tpu.ops.pallas_topk_v4 import _v4_search, pallas_topk_block_v4

    Q, N, D, k = 64, 8192, 32, 4
    emb = rng.randn(N, D).astype(np.float32)
    queries = rng.randn(Q, D).astype(np.float32)
    int8_rows, scale = quantize_int8(emb)
    q_folded = (queries * scale[None, :]).astype(np.float32)
    _, _, n_flag = _v4_search(
        jnp.asarray(q_folded), jnp.asarray(int8_rows), jnp.int32(N), k,
        q_tile=64, p_tile=256, budget=8, interpret=True,
    )
    assert int(n_flag) <= 8, "shape chosen to stay within budget"
    s, i = pallas_topk_block_v4(
        jnp.asarray(q_folded), jnp.asarray(int8_rows), N, k,
        q_tile=64, p_tile=256, budget=8, interpret=True,
    )
    rs, ri, full_int = _int8_mxu_oracle(q_folded, int8_rows, k)
    _assert_int8_topk(s, i, rs, ri, full_int)


def test_pallas_select_topk_matches_laxtopk(rng):
    """The fused select kernel (precomputed scores -> top-k): value
    equality with lax.top_k and tie-class membership on duplicates."""
    from haconvdr_tpu.ops.pallas_topk_v4 import pallas_select_topk

    Q, C, k = 64, 1000, 12
    s = rng.randn(Q, C).astype(np.float32)
    vs, vi = pallas_select_topk(
        jnp.asarray(s), k, q_tile=32, c_tile=256, interpret=True
    )
    rs, ri = jax.lax.top_k(jnp.asarray(s), k)
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(ri))

    # duplicates: membership per tie class
    sd = np.repeat(rng.randn(Q, 125).astype(np.float32), 8, axis=1)
    vs, vi = pallas_select_topk(
        jnp.asarray(sd), k, q_tile=32, c_tile=256, interpret=True
    )
    vs, vi = np.asarray(vs), np.asarray(vi)
    rs = np.asarray(jax.lax.top_k(jnp.asarray(sd), k)[0])
    np.testing.assert_array_equal(vs, rs)
    for r in range(Q):
        np.testing.assert_array_equal(sd[r, vi[r]], vs[r])
        assert len(set(vi[r])) == k


def test_pallas_select_topk_t_matches_laxtopk(rng):
    """Column-oriented select kernel ([C, Q] transposed layout)."""
    from haconvdr_tpu.ops.pallas_topk_v4 import pallas_select_topk_t

    Q, C, k = 64, 1000, 12
    s = rng.randn(C, Q).astype(np.float32)
    vs, vi = pallas_select_topk_t(
        jnp.asarray(s), k, c_tile=256, q_sub=64, interpret=True
    )
    rs, ri = jax.lax.top_k(jnp.asarray(s.T), k)
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(ri))

    # duplicates: membership per tie class, small k = B (the fw use)
    sd = np.repeat(rng.randn(125, Q).astype(np.float32), 8, axis=0)
    vs, vi = pallas_select_topk_t(jnp.asarray(sd), 4, interpret=True)
    vs, vi = np.asarray(vs), np.asarray(vi)
    rs = np.asarray(jax.lax.top_k(jnp.asarray(sd.T), 4)[0])
    np.testing.assert_array_equal(vs, rs)
    for r in range(Q):
        np.testing.assert_array_equal(sd[vi[r], r], vs[r])
        assert len(set(vi[r])) == 4


def test_pallas_select_topk_t_warm_floor_exact(rng):
    """Warm-started admission floor + 256-wide segments (round 5, shipped
    in _v4_search's v_k and final selects): bit-identical VALUES to the
    cold kernel, ids valid per tie class; the floor (k-th largest segment
    max) provably lower-bounds the k-th value.  Also: warm_floor returns
    None when k exceeds the segment count (the subset bound fails there),
    and ties at exactly the floor are still admitted."""
    from haconvdr_tpu.ops.pallas_topk_v4 import (
        pallas_select_topk_t,
        warm_floor,
    )

    Q, C, k = 64, 1100, 8  # segs = ceil(1100/128) = 9 >= k
    s = rng.randn(C, Q).astype(np.float32)
    sj = jnp.asarray(s)
    rm0 = warm_floor(sj, k)
    assert rm0 is not None
    vs, vi = pallas_select_topk_t(
        sj, k, c_tile=256, q_sub=64, rm0=rm0, seg=256, interpret=True
    )
    rs, ri = jax.lax.top_k(jnp.asarray(s.T), k)
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(ri))

    # exact ties at the floor: duplicate the k-th value many times; the
    # warm select must still return the exact multiset of top values
    sd = s.copy()
    kth = np.sort(sd[:, 0])[-k]
    sd[:40, 0] = kth
    sdj = jnp.asarray(sd)
    vs, vi = pallas_select_topk_t(
        sdj, k, rm0=warm_floor(sdj, k), seg=256, interpret=True
    )
    vs, vi = np.asarray(vs), np.asarray(vi)
    rs = np.asarray(jax.lax.top_k(jnp.asarray(sd.T), k)[0])
    np.testing.assert_array_equal(vs, rs)
    for r in range(Q):
        np.testing.assert_array_equal(sd[vi[r], r], vs[r])
        assert len(set(vi[r])) == k

    assert warm_floor(jnp.asarray(s[:256]), 8) is None  # 2 segs < k


def test_block_searcher_first_block_routes_v4(rng, monkeypatch):
    """The stream's FIRST block is statically unseeded, so BlockSearcher's
    real _block_topk must route it through the v4 window-top-2 kernel;
    later blocks go through the seeded v3 ramp.  Exercised end to end in
    interpret mode by patching the kernel entries at module level (the
    usual tests monkeypatch _block_topk itself and so skip this routing)."""
    import haconvdr_tpu.ops.pallas_topk as v3m
    import haconvdr_tpu.ops.pallas_topk_v4 as v4m

    calls = {"v4": 0, "v3": 0}
    real_v4, real_v3 = v4m.pallas_topk_block_v4, v3m.pallas_topk_block

    def spy_v4(q, p, nv, k, **kw):
        calls["v4"] += 1
        kw.setdefault("interpret", True)
        kw.setdefault("p_tile", 256)
        return real_v4(q, p, nv, k, **kw)

    def spy_v3(q, p, nv, k, **kw):
        calls["v3"] += 1
        kw.setdefault("interpret", True)
        kw.setdefault("p_tile", 256)
        return real_v3(q, p, nv, k, **kw)

    monkeypatch.setattr(v4m, "pallas_topk_block_v4", spy_v4)
    monkeypatch.setattr(v3m, "pallas_topk_block", spy_v3)

    Q, D, k = 16, 16, 9
    q = rng.randn(Q, D).astype(np.float32)
    blocks = []
    base, all_emb = 0, []
    for n in (700, 500):
        emb = rng.randn(n, D).astype(np.float32)
        blocks.append((emb, np.arange(base, base + n, dtype=np.int64)))
        all_emb.append(emb)
        base += n

    xla = BlockSearcher(top_k=k, passage_chunk=128, use_pallas=False)
    ref_s, ref_i = xla.search(q, list(blocks))

    pal = BlockSearcher(
        top_k=k, query_chunk=128, use_pallas=True, v4_min_rows=0
    )
    s, i = pal.search(q, list(blocks))

    assert calls["v4"] == 1, calls  # first block only
    assert calls["v3"] >= 1, calls  # seeded later block
    np.testing.assert_allclose(s, ref_s, rtol=1e-5)
    np.testing.assert_array_equal(i, ref_i)

    # below the default v4_min_rows threshold, the first block must stay
    # on v3 (v4's fixed rescore cost loses on small blocks)
    calls["v4"] = calls["v3"] = 0
    small = BlockSearcher(top_k=k, query_chunk=128, use_pallas=True)
    s2, i2 = small.search(q, list(blocks))
    assert calls["v4"] == 0 and calls["v3"] >= 2, calls
    np.testing.assert_allclose(s2, ref_s, rtol=1e-5)
    np.testing.assert_array_equal(i2, ref_i)


def test_resolve_select_geometry_policy():
    """Auto (seg_width, budget) policy (resolve_select_geometry): wide
    256-segments only for >= 2M row blocks that tile at p_tile=2048,
    with the measured-robust budgets (probes/probe_v4_segwidth.py:
    bf16 n_flag_max 5 at 2.5M means budget 4 would trip the v3
    fallback; int8's budget 8 erases the win so it gets 6)."""
    from haconvdr_tpu.ops.pallas_topk_v4 import resolve_select_geometry

    # big float block: wide + insurance budget
    assert resolve_select_geometry(2_500_608, jnp.bfloat16) == (256, 8)
    assert resolve_select_geometry(2_500_608, jnp.float32) == (256, 8)
    # big int8 block: wide + the measured-free budget 6
    assert resolve_select_geometry(2_500_608, jnp.int8) == (256, 6)
    # small block: flag rate ~ 1/W overflows wide segments
    assert resolve_select_geometry(301_056, jnp.bfloat16) == (128, 4)
    # big but not 2048-tileable: p_tile=2048 impossible
    assert resolve_select_geometry(2_500_608 + 1024, jnp.int8) == (128, 4)
    # explicit values pass through untouched
    assert resolve_select_geometry(2_500_608, jnp.int8, 128, 4) == (128, 4)
    # explicit width, auto budget follows the width
    assert resolve_select_geometry(301_056, jnp.bfloat16, 256) == (256, 8)
    assert resolve_select_geometry(301_056, jnp.int8, 256) == (256, 6)


def test_pallas_v4_seg256_interpret_exact(rng):
    """seg_width=256 window partition (round-5 wide-segment mode): oracle
    equality including n_valid masking.  The flag-rule exactness argument
    is width-independent; this pins the wider windows' triple extraction,
    rescore row count (256/window), and final pool.  Interpret mode has
    no Mosaic store-alignment constraint, so small p_tile keeps it
    fast (the on-chip pin at N=301k is probes/probe_v4_segwidth.py
    exact_sw256)."""
    from haconvdr_tpu.ops.pallas_topk_v4 import pallas_topk_block_v4

    Q, N, D, k = 128, 2048, 32, 10
    q = rng.randn(Q, D).astype(np.float32)
    p = rng.randn(N, D).astype(np.float32)
    s, i = pallas_topk_block_v4(
        jnp.asarray(q), jnp.asarray(p), N, k,
        q_tile=64, p_tile=512, seg_width=256, budget=16, interpret=True,
    )
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))

    p2 = p.copy()
    p2[1500:] *= 100.0  # padded rows would win if unmasked
    s, i = pallas_topk_block_v4(
        jnp.asarray(q), jnp.asarray(p2), 1500, k,
        q_tile=64, p_tile=512, seg_width=256, budget=16, interpret=True,
    )
    rs, ri = exact_topk_oracle(jnp.asarray(q), jnp.asarray(p2[:1500]), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))

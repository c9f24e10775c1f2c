"""End-to-end slice: synthetic collection -> tokenize -> mesh-encode ->
blocked search -> TREC metrics.  The identity property drives correctness:
a query with exactly a passage's tokens embeds identically to it, and
LayerNorm'd embeddings have equal norms, so the gold passage must rank
first => MRR = 100."""

import json
import os

import numpy as np
import pytest

import jax

from haconvdr_tpu.config import (
    DataConfig,
    ExperimentConfig,
    IndexConfig,
    ModelConfig,
    SearchConfig,
)
from haconvdr_tpu.index.build import encode_corpus, tokenize_collection
from haconvdr_tpu.index.store import EmbeddingBlockStore, TokenizedCorpus
from haconvdr_tpu.models.encoder import init_encoder_params
from haconvdr_tpu.parallel.mesh import make_mesh
from haconvdr_tpu.parallel.sharded_encode import make_sharded_encode_fn, shard_params
from haconvdr_tpu.retrieval import (
    build_test_examples,
    gen_metric_score_and_save,
    get_test_query_embeddings,
)
from haconvdr_tpu.utils.testing import FakeTokenizer

N_PASSAGES = 50
WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _passage_text(pid):
    return " ".join(WORDS[(pid + j) % len(WORDS)] for j in range(4)) + f" tok{pid}"


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    # 1. synthetic collection tsv (id, text, title)
    coll = tmp / "collection.tsv"
    with open(coll, "w") as f:
        f.write("id\ttext\ttitle\n")
        for pid in range(1, N_PASSAGES + 1):
            f.write(f"{pid}\t{_passage_text(pid)}\ttitle {pid}\n")

    tok = FakeTokenizer()
    mcfg = ModelConfig.tiny(vocab_size=512)
    icfg = IndexConfig(
        raw_collection_path=str(coll),
        data_output_path=str(tmp / "tokenized"),
        max_seq_length=16,
        num_tokenize_workers=1,
    )
    corpus = tokenize_collection(icfg, tokenizer=tok)
    assert len(corpus) == N_PASSAGES

    # 2. encode over the mesh in 3 blocks
    mesh = make_mesh()
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    fn = make_sharded_encode_fn(mesh, mcfg)
    store = encode_corpus(
        corpus, fn, shard_params(mesh, params),
        str(tmp / "embeds"), batch_size=16, per_block_passage_num=24,
    )
    # block_rows = (24 // 16) * 16 = 16 -> blocks of 16,16,16,2
    assert store.num_blocks() == 4
    return tmp, tok, mcfg, params, corpus, mesh


def _write_queries(tmp, gold_pids, fname="test.json"):
    test_file = tmp / fname
    with open(test_file, "w") as f:
        for i, pid in enumerate(gold_pids):
            rec = {
                "sample_id": f"E2E_1_{i + 1}",
                "cur_utt_text": _passage_text(pid),
                "last_response": "",
                "pos_docs": [_passage_text(pid)],
                "pos_docs_pids": [pid],
                "rel_label": [],
            }
            f.write(json.dumps(rec) + "\n")
    return str(test_file)


def test_full_retrieval_slice(pipeline):
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    gold = [3, 17, 25, 42, 49, 8, 31]
    test_file = _write_queries(tmp, gold)
    qrel_file = tmp / "qrel.trec"
    with open(qrel_file, "w") as f:
        for i, pid in enumerate(gold):
            f.write(f"E2E_1_{i + 1} 0 {pid} 1\n")

    cfg = ExperimentConfig(
        data=DataConfig(
            dataset="topiocqa", test_file_path=test_file, is_train=False,
            use_PRL=False, max_query_length=16, max_doc_length=16,
            max_concat_length=24,
        ),
        model=mcfg,
        search=SearchConfig(
            passage_embeddings_dir_path=str(tmp / "embeds"),
            top_k=10, qrel_output_path=str(tmp / "out"),
            output_trec_file="res.trec",
            trec_gold_qrel_file_path=str(qrel_file),
            passage_chunk=8, query_chunk=4,
            per_device_test_batch_size=1,
        ),
    )
    embs, qids = get_test_query_embeddings(
        cfg, params, mesh=mesh, tokenizer=tok, query_key="conv_qp"
    )
    assert embs.shape == (len(gold), mcfg.embedding_dim)
    assert qids == [f"E2E_1_{i + 1}" for i in range(len(gold))]

    res = gen_metric_score_and_save(
        cfg, embs, qids, offset2pid=corpus.offset2pid()
    )
    assert res["MRR"] == 100.0
    assert res["Recall@10"] == 100.0
    # run file exists in reference layout
    lines = open(os.path.join(cfg.search.qrel_output_path, "res.trec")).read().splitlines()
    assert lines[0].split()[:2] == ["E2E_1_1", "Q0"]
    assert lines[0].split()[2] == "3"  # gold pid at rank 1


def test_sharded_index_path_equivalent(pipeline):
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.parallel.sharded_search import ShardedIndex
    from haconvdr_tpu.ops.topk import BlockSearcher

    store = EmbeddingBlockStore(str(tmp / "embeds"))
    blocks = list(store.iter_blocks())
    emb = np.concatenate([e for e, _ in blocks])
    ids = np.concatenate([i for _, i in blocks])

    rng = np.random.RandomState(3)
    queries = rng.randn(5, mcfg.embedding_dim).astype(np.float32)

    s1, i1 = BlockSearcher(top_k=7, passage_chunk=8, query_chunk=5).search(
        queries, iter(blocks)
    )
    idx = ShardedIndex(make_mesh(), emb, ids=ids, chunk=8)
    s2, i2 = idx.search(queries, 7)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i1, i2)


def test_prj_labeling_flow(pipeline):
    """Probes through the full PRJ loop: a history turn whose query pair
    matches the gold passage must be labeled 1; an unrelated one 0."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.retrieval import run_prj_labeling

    # conv 7, turn 2: gold passage 12; bare query IS the gold text, so
    # probe 0 scores MRR 1.0 and no expansion can strictly beat it ->
    # rel_label deterministically [0].  conv 8 exercises the wiring with
    # an arbitrary expansion (label value model-dependent, structure not).
    probes = [
        {"id": "7-2-0", "conv_id": 7, "turn_id": 2,
         "query": _passage_text(12), "query_pair": "",
         "pos_docs_id": [12], "last_response": ""},
        {"id": "7-2-1", "conv_id": 7, "turn_id": 2,
         "query": _passage_text(12),
         "query_pair": "unrelated words entirely",
         "pos_docs_id": [12], "last_response": ""},
        {"id": "8-2-0", "conv_id": 8, "turn_id": 2,
         "query": "some other question", "query_pair": "",
         "pos_docs_id": [20], "last_response": ""},
        {"id": "8-2-1", "conv_id": 8, "turn_id": 2,
         "query": "some other question",
         "query_pair": _passage_text(20),
         "pos_docs_id": [20], "last_response": ""},
    ]
    qrel_file = tmp / "probe_qrel.trec"
    with open(qrel_file, "w") as f:
        for p in probes:
            f.write(f"{p['id']} Q0 {p['pos_docs_id'][0]} 1\n")

    cfg = ExperimentConfig(
        data=DataConfig(
            max_query_length=16, max_doc_length=16, max_concat_length=48,
        ),
        model=mcfg,
        search=SearchConfig(
            passage_embeddings_dir_path=str(tmp / "embeds"),
            top_k=10, passage_chunk=8, query_chunk=4,
            per_device_test_batch_size=1,
        ),
    )
    rel = run_prj_labeling(
        cfg, params, probes, str(qrel_file), tok, mesh=mesh,
        offset2pid=corpus.offset2pid(),
    )
    assert rel["7-2"] == [0]  # base probe already at MRR 1.0
    assert rel["7-1"] == []
    assert rel["8-1"] == []
    assert rel["8-2"] in ([0], [1])  # structure; value is model-dependent


def test_retriever_serving_api(pipeline):
    """Retriever: conversational query -> ranked pids via the resident
    sharded index; exact-token query must return its passage at rank 1."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.config import DataConfig, SearchConfig
    from haconvdr_tpu.index.store import EmbeddingBlockStore
    from haconvdr_tpu.serve import Retriever

    store = EmbeddingBlockStore(str(tmp / "embeds"))
    r = Retriever(
        tok, params, mcfg, store,
        offset2pid=corpus.offset2pid(),
        data_cfg=DataConfig(
            is_train=False, use_PRL=False,
            max_query_length=16, max_doc_length=16, max_concat_length=24,
        ),
        search_cfg=SearchConfig(top_k=5, per_device_test_batch_size=1),
        resident=True,
    )
    hits = r.retrieve(_passage_text(21))
    assert hits[0][0] == 21
    # history-aware query shape-check
    hits2 = r.retrieve(
        "follow up", history=[("earlier q", "earlier a")],
        history_passages=[_passage_text(7)], k=3,
    )
    assert len(hits2) == 3

    # encoder_int8: the batched-tier int8-weight query tower must serve
    # the same exact-token top hit through the same index (the tower's
    # quantization drift is far below the exact-match margin)
    r8 = Retriever(
        tok, params, mcfg, EmbeddingBlockStore(str(tmp / "embeds")),
        offset2pid=corpus.offset2pid(),
        data_cfg=r.data_cfg, search_cfg=r.search_cfg,
        resident=True, encoder_int8=True,
    )
    hits8 = r8.retrieve(_passage_text(21))
    assert hits8[0][0] == 21


def test_build_test_examples_dataset_dispatch(pipeline, tmp_path):
    """retrieval.build_test_examples dispatches qrecc and cast datasets and
    their query keys embed through the mesh."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.config import DataConfig, ExperimentConfig, SearchConfig
    from haconvdr_tpu.retrieval import build_test_examples, get_test_query_embeddings

    qrecc_file = tmp_path / "qrecc_test.json"
    with open(qrecc_file, "w") as f:
        f.write(json.dumps({
            "sample_id": "QReCC-Test_1_1", "cur_utt_text": "a question",
            "cur_response_text": "", "ctx_utts_text": [],
            "pos_docs_text": ["whatever"], "rel_label": [],
        }) + "\n")
    cast_file = tmp_path / "cast_test.json"
    with open(cast_file, "w") as f:
        f.write(json.dumps({
            "id": "81_1", "topic_number": 81, "query_number": 1,
            "input": ["first q"], "manual_response": [],
        }) + "\n")

    for dataset, path, test_type, key in (
        ("qrecc", qrecc_file, "convqa", "conv_qa"),
        ("cast", cast_file, "convqp", "conv_qp"),
    ):
        cfg = ExperimentConfig(
            data=DataConfig(
                dataset=dataset, test_file_path=str(path), is_train=False,
                use_PRL=False, max_query_length=16, max_doc_length=16,
                max_concat_length=24,
            ),
            model=mcfg,
            search=SearchConfig(test_type=test_type, per_device_test_batch_size=1),
        )
        examples = build_test_examples(cfg, tok)
        assert key in examples[0]
        embs, qids = get_test_query_embeddings(
            cfg, params, mesh=mesh, examples=examples
        )
        assert embs.shape == (1, mcfg.embedding_dim)


def test_search_block_num_limit(pipeline):
    """search.passage_block_num truncates the block scan like the
    reference's fixed passage_block_num loop (test_HAConvDR_topiocqa.py:77)."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.config import DataConfig, ExperimentConfig, SearchConfig
    from haconvdr_tpu.retrieval import search_embedding_store

    rng = np.random.RandomState(1)
    queries = rng.randn(3, mcfg.embedding_dim).astype(np.float32)
    base = dict(
        passage_embeddings_dir_path=str(tmp / "embeds"),
        top_k=5, passage_chunk=8, query_chunk=4,
    )
    cfg_all = ExperimentConfig(search=SearchConfig(**base, passage_block_num=-1))
    cfg_two = ExperimentConfig(search=SearchConfig(**base, passage_block_num=2))
    s_all, i_all = search_embedding_store(cfg_all, queries)
    s_two, i_two = search_embedding_store(cfg_two, queries)
    # first two blocks hold offsets < 32; the full scan may find better hits
    assert i_two.max() < 32
    assert (s_all.max(axis=1) >= s_two.max(axis=1)).all()


def test_search_superblock_config_plumbed(pipeline):
    """SearchConfig.superblock_rows routes the streaming search through
    the super-block accumulator; results must equal the per-block path."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.config import ExperimentConfig, SearchConfig
    from haconvdr_tpu.retrieval import search_embedding_store

    rng = np.random.RandomState(2)
    queries = rng.randn(3, mcfg.embedding_dim).astype(np.float32)
    base = dict(
        passage_embeddings_dir_path=str(tmp / "embeds"),
        top_k=5, passage_chunk=8, query_chunk=4,
    )
    cfg_pb = ExperimentConfig(search=SearchConfig(**base))
    cfg_sb = ExperimentConfig(search=SearchConfig(**base, superblock_rows=24))
    s0, i0 = search_embedding_store(cfg_pb, queries)
    s1, i1 = search_embedding_store(cfg_sb, queries)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i0, i1)


def test_retriever_streaming_mode(pipeline):
    """Retriever with resident=False streams blocks per search."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.config import DataConfig, SearchConfig
    from haconvdr_tpu.index.store import EmbeddingBlockStore
    from haconvdr_tpu.serve import Retriever

    store = EmbeddingBlockStore(str(tmp / "embeds"))
    r = Retriever(
        tok, params, mcfg, store,
        offset2pid=corpus.offset2pid(),
        data_cfg=DataConfig(
            is_train=False, use_PRL=False,
            max_query_length=16, max_doc_length=16, max_concat_length=24,
        ),
        search_cfg=SearchConfig(
            top_k=5, per_device_test_batch_size=1,
            passage_chunk=8, query_chunk=128,
        ),
        resident=False,
    )
    hits = r.retrieve(_passage_text(33))
    assert hits[0][0] == 33


def test_retriever_ivf_mode(pipeline):
    """Retriever with ivf=True serves through the cluster-pruned index;
    with every cluster probed it must find the exact-token passage at
    rank 1 like the flat path."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.config import DataConfig, SearchConfig
    from haconvdr_tpu.index.store import EmbeddingBlockStore
    from haconvdr_tpu.serve import Retriever

    store = EmbeddingBlockStore(str(tmp / "embeds"))
    r = Retriever(
        tok, params, mcfg, store,
        offset2pid=corpus.offset2pid(),
        data_cfg=DataConfig(
            is_train=False, use_PRL=False,
            max_query_length=16, max_doc_length=16, max_concat_length=24,
        ),
        search_cfg=SearchConfig(top_k=5, per_device_test_batch_size=1),
        ivf=True, ivf_nlist=4, ivf_nprobe=4,
    )
    assert r.ivf_index is not None and r.index is None
    hits = r.retrieve(_passage_text(21))
    assert hits[0][0] == 21


def test_retriever_int8_resident(pipeline):
    """Retriever with store_dtype='int8': the quantized resident index
    must still put the exact-token passage at rank 1."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.config import DataConfig, SearchConfig
    from haconvdr_tpu.index.store import EmbeddingBlockStore
    from haconvdr_tpu.serve import Retriever

    store = EmbeddingBlockStore(str(tmp / "embeds"))
    r = Retriever(
        tok, params, mcfg, store,
        offset2pid=corpus.offset2pid(),
        data_cfg=DataConfig(
            is_train=False, use_PRL=False,
            max_query_length=16, max_doc_length=16, max_concat_length=24,
        ),
        search_cfg=SearchConfig(top_k=5, per_device_test_batch_size=1),
        resident=True, store_dtype="int8",
    )
    import jax.numpy as jnp

    assert r.index.passages.dtype == jnp.int8 and r.index.scales is not None
    # this fixture's random tiny encoder maps every passage to near-tied
    # embeddings (cosine ~0.99), so RANKING under quantization is
    # genuinely undefined here — int8 ranking exactness is covered by
    # tests/test_quantize.py against the dequantized oracle on separated
    # data.  At serve level assert the mechanics: valid pids, finite
    # scores, full result set.
    hits = r.retrieve(_passage_text(12))
    assert len(hits) == 5
    valid = set(corpus.offset2pid())
    assert all(pid in valid for pid, _ in hits)
    assert all(np.isfinite(s) for _, s in hits)


def test_retriever_ivf_int8(pipeline):
    """Retriever(ivf=True, store_dtype='int8') must build QUANTIZED IVF
    buckets (round-2 advisor finding: the int8 request was silently
    dropped and f32 buckets were built, 4x the advertised footprint)."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    import jax.numpy as jnp

    from haconvdr_tpu.config import DataConfig, SearchConfig
    from haconvdr_tpu.index.store import EmbeddingBlockStore
    from haconvdr_tpu.serve import Retriever

    store = EmbeddingBlockStore(str(tmp / "embeds"))
    r = Retriever(
        tok, params, mcfg, store,
        offset2pid=corpus.offset2pid(),
        data_cfg=DataConfig(
            is_train=False, use_PRL=False,
            max_query_length=16, max_doc_length=16, max_concat_length=24,
        ),
        search_cfg=SearchConfig(top_k=5, per_device_test_batch_size=1),
        ivf=True, ivf_nlist=8, ivf_nprobe=8, store_dtype="int8",
    )
    assert r.ivf_index.buckets.dtype == jnp.int8
    assert r.ivf_index.scale is not None
    hits = r.retrieve(_passage_text(12))
    assert len(hits) == 5
    valid = set(corpus.offset2pid())
    assert all(pid in valid for pid, _ in hits)
    assert all(np.isfinite(s) for _, s in hits)


def test_retriever_superblock_int8(pipeline):
    """Retriever(resident=False) with superblock_dtype='int8': the store's
    global_scale is derived automatically and the int8 accumulator path
    returns a full, valid result set (ranking exactness vs the int8 model
    is pinned in tests/test_topk.py on separated data)."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.config import DataConfig, SearchConfig
    from haconvdr_tpu.index.quantize import quantize_int8
    from haconvdr_tpu.index.store import EmbeddingBlockStore
    from haconvdr_tpu.serve import Retriever

    src = EmbeddingBlockStore(str(tmp / "embeds"))
    dst = EmbeddingBlockStore(str(tmp / "embeds_sb_int8"), fmt="npy")
    for b, (emb, ids) in enumerate(src.iter_blocks()):
        q8, sc = quantize_int8(np.asarray(emb, np.float32))
        dst.write_block(b, q8, ids, scale=sc)

    r = Retriever(
        tok, params, mcfg, dst,
        offset2pid=corpus.offset2pid(),
        data_cfg=DataConfig(
            is_train=False, use_PRL=False,
            max_query_length=16, max_doc_length=16, max_concat_length=24,
        ),
        search_cfg=SearchConfig(
            top_k=5, per_device_test_batch_size=1, passage_chunk=8,
            superblock_rows=24, superblock_dtype="int8",
        ),
        resident=False,
    )
    assert r.searcher.superblock_dtype == "int8"
    np.testing.assert_allclose(
        r.searcher.superblock_scale, dst.global_scale()
    )
    hits = r.retrieve(_passage_text(12))
    assert len(hits) == 5
    valid = set(corpus.offset2pid())
    assert all(pid in valid for pid, _ in hits)
    assert all(np.isfinite(s) for _, s in hits)


def test_retriever_ivf_dir_persistence(pipeline):
    """Retriever(ivf=True, ivf_dir=...): first construction builds AND
    persists the sharded index; the second loads it (no rebuild — the
    store is not touched) and serves identical results."""
    tmp, tok, mcfg, params, corpus, mesh = pipeline
    from haconvdr_tpu.config import DataConfig, SearchConfig
    from haconvdr_tpu.index.store import EmbeddingBlockStore
    from haconvdr_tpu.serve import Retriever

    store = EmbeddingBlockStore(str(tmp / "embeds"))
    dcfg = DataConfig(
        is_train=False, use_PRL=False,
        max_query_length=16, max_doc_length=16, max_concat_length=24,
    )
    scfg = SearchConfig(top_k=5, per_device_test_batch_size=1)
    ivf_dir = str(tmp / "ivf_artifacts")
    kw = dict(
        offset2pid=corpus.offset2pid(), data_cfg=dcfg, search_cfg=scfg,
        ivf=True, ivf_nlist=4, ivf_nprobe=4, ivf_dir=ivf_dir,
    )
    r1 = Retriever(tok, params, mcfg, store, **kw)
    import os

    assert os.path.exists(os.path.join(ivf_dir, "ivf_sharded_meta.json"))
    hits1 = r1.retrieve(_passage_text(21))

    class _MetadataOnly:
        """Reload may read block-size METADATA (the staleness row-count
        check) but must never stream embedding payloads (the rebuild)."""

        def __init__(self, inner):
            self._inner = inner

        def num_blocks(self):
            return self._inner.num_blocks()

        def block_size(self, b):
            return self._inner.block_size(b)

        def iter_blocks(self, *a, **k):
            raise AssertionError("reload path rebuilt the IVF index")

    r2 = Retriever(tok, params, mcfg, _MetadataOnly(store), **kw)
    assert r2.ivf_index is not None
    # identical constructor args serve identical results across the
    # restart — including the probe-everything nprobe rounding
    assert r2.ivf_index.nprobe == r1.ivf_index.nprobe
    hits2 = r2.retrieve(_passage_text(21))
    assert hits1 == hits2
    assert hits2[0][0] == 21

    # stale artifacts are refused, not silently served: a store with a
    # different row count must raise
    class _Grown(_MetadataOnly):
        def block_size(self, b):
            return self._inner.block_size(b) + 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="stale"):
        Retriever(tok, params, mcfg, _Grown(store), **kw)

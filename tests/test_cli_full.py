"""Full CLI-surface integration: fabricate a tiny offline HF checkpoint
(byte-level Roberta vocab + converted weights), then drive the real
command-line entry points end to end on the CPU mesh:

    gen_tokenized_doc -> gen_doc_embeddings -> test_retrieval

This exercises load_model/HF-tokenizer loading, the TOML/override config
surface, and the reference-layout outputs — the exact workflow a user of
the reference would run (README.md:15-98).
"""

import json
import os

import numpy as np
import pytest

import jax

from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models.encoder import init_encoder_params
from haconvdr_tpu.models.hf_import import save_hf_checkpoint

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    """Minimal offline ANCE-style checkpoint dir: config.json +
    pytorch_model.bin + byte-level BPE tokenizer files."""
    out = tmp_path_factory.mktemp("ckpt")
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    byte_syms = list(bytes_to_unicode().values())
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for s in byte_syms:
        if s not in vocab:
            vocab[s] = len(vocab)
    # a couple of merges so common words aren't pure chars
    merges = ["#version: 0.2", "t h", "th e"]
    with open(out / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(out / "merges.txt", "w") as f:
        f.write("\n".join(merges) + "\n")

    cfg = ModelConfig.tiny(vocab_size=len(vocab) + 8, max_position_embeddings=520)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    save_hf_checkpoint(params, cfg, str(out))
    return str(out), cfg


def test_cli_tokenize_embed_eval(hf_checkpoint, tmp_path):
    ckpt, cfg = hf_checkpoint
    from transformers import RobertaTokenizer

    tok = RobertaTokenizer.from_pretrained(ckpt)
    assert tok.encode("the the") is not None  # tokenizer files load

    # tiny collection
    coll = tmp_path / "coll.tsv"
    with open(coll, "w") as f:
        f.write("id\ttext\ttitle\n")
        for pid in range(1, 13):
            s_ = chr(96 + pid) * 3 + " " + chr(64 + pid) + str(pid)
            f.write(f"{pid}\t{s_}\tt [SEP] {pid}\n")

    from haconvdr_tpu.cli.gen_tokenized_doc import main as tokenize_main

    tok_dir = tmp_path / "tokenized"
    tokenize_main([
        f"model.pretrained_encoder_path={ckpt}",
        f"index.raw_collection_path={coll}",
        f"index.data_output_path={tok_dir}",
        "index.max_seq_length=16",
        "index.num_tokenize_workers=1",
    ])
    assert (tok_dir / "meta.json").exists()
    assert (tok_dir / "offset2pid.pickle").exists()

    from haconvdr_tpu.cli.gen_doc_embeddings import main as embed_main

    emb_dir = tmp_path / "embeds"
    embed_main([
        f"model.pretrained_encoder_path={ckpt}",
        f"index.tokenized_dir={tok_dir}",
        f"index.data_output_path={emb_dir}",
        "index.per_device_eval_batch_size=1",
        "index.per_block_passage_num=8",
    ])
    from haconvdr_tpu.index.store import EmbeddingBlockStore

    store = EmbeddingBlockStore.open_auto(str(emb_dir))
    assert store.num_blocks() == 2
    emb0, ids0 = store.read_block(0)
    assert emb0.shape[1] == cfg.embedding_dim

    # test queries: exact passage text => identity property => MRR 100
    test_file = tmp_path / "test.json"
    with open(test_file, "w") as f:
        for i, pid in enumerate((2, 9)):
            f.write(json.dumps({
                "sample_id": f"CLI_1_{i + 1}",
                "cur_utt_text": chr(96 + pid) * 3 + " " + chr(64 + pid) + str(pid),
                "last_response": "", "pos_docs": [chr(96 + pid) * 3 + " " + chr(64 + pid) + str(pid)],
                "pos_docs_pids": [pid], "rel_label": [],
            }) + "\n")
    qrel = tmp_path / "qrel.trec"
    with open(qrel, "w") as f:
        f.write("CLI_1_1 0 2 1\nCLI_1_2 0 9 1\n")

    from haconvdr_tpu.cli.test_retrieval import main as eval_main

    res = eval_main([
        f"model.pretrained_encoder_path={ckpt}",
        "data.dataset=topiocqa",
        f"data.test_file_path={test_file}",
        "data.use_PRL=false",
        "data.max_query_length=16", "data.max_doc_length=16",
        "data.max_concat_length=24",
        "search.test_type=convqp",
        f"search.passage_embeddings_dir_path={emb_dir}",
        f"search.passage_offset2pid_path={tok_dir / 'offset2pid.pickle'}",
        f"search.qrel_output_path={tmp_path / 'out'}",
        "search.output_trec_file=res.trec",
        f"search.trec_gold_qrel_file_path={qrel}",
        "search.top_k=5", "search.passage_chunk=8", "search.query_chunk=4",
        "search.per_device_test_batch_size=1",
    ])
    assert res["MRR"] == 100.0
    # run file in the reference layout
    line = open(tmp_path / "out" / "res.trec").read().splitlines()[0].split()
    assert line[1] == "Q0" and line[6] == "ance"


def test_cli_train(hf_checkpoint, tmp_path):
    """Drive cli.train_retrieval end to end: builds examples, runs the
    jitted step, writes the reference-named HF checkpoint dir."""
    ckpt, cfg = hf_checkpoint
    train_file = tmp_path / "train.json"
    import random as _r

    r = _r.Random(0)
    with open(train_file, "w") as f:
        for i in range(16):
            words = " ".join(chr(97 + r.randrange(26)) for _ in range(4))
            f.write(json.dumps({
                "sample_id": f"T_1_{i + 1}",
                "cur_utt_text": words,
                "last_response": "",
                "pos_docs": [words + " gold"], "pos_docs_pids": [i],
                "rel_label": [],
                "bm25_hard_neg_docs": ["some negative text"],
                "pseudo_prepos_docs": [], "prepos_neg_docs": [],
            }) + "\n")

    from haconvdr_tpu.cli.train_retrieval import main as train_main

    out_dir = tmp_path / "model_out"
    train_main([
        f"model.pretrained_encoder_path={ckpt}",
        "model.remat=false",
        "data.dataset=topiocqa",
        f"data.train_file_path={train_file}",
        "data.mode=convqp", "data.use_PRL=true",
        "data.max_query_length=12", "data.max_doc_length=12",
        "data.max_response_length=12", "data.max_concat_length=24",
        "train.num_train_epochs=1", "train.per_device_train_batch_size=1",
        "train.accumulation_steps=2", "train.print_steps=0",
        "train.is_pseudo_prepos=false", "train.is_prepos_neg=false",
        f"train.model_output_path={out_dir}",
    ])
    # reference checkpoint naming (src/train_HAConvDR_topiocqa.py:36-39)
    ckpts = os.listdir(out_dir)
    assert len(ckpts) == 1 and "convqp-goldPRL" in ckpts[0]
    saved = out_dir / ckpts[0]
    assert (saved / "pytorch_model.bin").exists()
    assert (saved / "config.json").exists()
    # saved checkpoint reloads through the factory
    from haconvdr_tpu.models.hf_import import load_hf_checkpoint

    params2, cfg2 = load_hf_checkpoint(str(saved))
    assert cfg2.num_hidden_layers == cfg.num_hidden_layers


def test_cli_train_prf(hf_checkpoint, tmp_path):
    """Drive the PRF training variant (data.is_PRF=true): expanded dataset
    (one extra example per pseudo-prepos passage used as a positive), plain
    ranking loss, PRF checkpoint naming — the rebuild of the reference's
    separate src/train_HAConvDR_topiocqa_PRF.py entry point (":37-41,81,146")."""
    ckpt, cfg = hf_checkpoint
    train_file = tmp_path / "train.json"
    import random as _r

    r = _r.Random(1)
    with open(train_file, "w") as f:
        for i in range(8):
            words = " ".join(chr(97 + r.randrange(26)) for _ in range(4))
            f.write(json.dumps({
                "sample_id": f"P_1_{i + 1}",
                "cur_utt_text": words,
                "last_response": "",
                "pos_docs": [words + " gold"], "pos_docs_pids": [i],
                "rel_label": [],
                "bm25_hard_neg_docs": ["some negative text"],
                # one pseudo positive per turn -> expanded set doubles
                "pseudo_prepos_docs": [words + " pseudo"],
                "prepos_neg_docs": [],
            }) + "\n")

    from haconvdr_tpu.cli.train_retrieval import main as train_main

    out_dir = tmp_path / "model_out"
    train_main([
        f"model.pretrained_encoder_path={ckpt}",
        "model.remat=false",
        "data.dataset=topiocqa",
        f"data.train_file_path={train_file}",
        "data.mode=convqp", "data.use_PRL=true",
        "data.is_PRF=true", "data.PRF_top=1", "data.hard_neg_type=bm25",
        "data.max_query_length=12", "data.max_doc_length=12",
        "data.max_response_length=12", "data.max_concat_length=24",
        "train.num_train_epochs=1", "train.per_device_train_batch_size=1",
        "train.accumulation_steps=1", "train.print_steps=0",
        "train.is_pseudo_prepos=true", "train.is_prepos_neg=false",
        f"train.model_output_path={out_dir}",
    ])
    # PRF checkpoint naming (src/train_HAConvDR_topiocqa_PRF.py:37-41)
    ckpts = os.listdir(out_dir)
    assert len(ckpts) == 1, ckpts
    name = ckpts[0]
    assert "goldPRL" in name and "bm25hard" in name
    assert "TruePRF-1-retriever" in name and "Trueprepos" in name
    saved = out_dir / name
    assert (saved / "pytorch_model.bin").exists()
    # the expanded builder doubled the example count (1 pseudo per turn);
    # the saved params differ from the init (updates were applied)
    from haconvdr_tpu.config import DataConfig
    from haconvdr_tpu.data.topiocqa import build_topiocqa_train_examples_expanded
    from transformers import RobertaTokenizer

    dcfg = DataConfig(
        dataset="topiocqa", train_file_path=str(train_file), is_train=True,
        use_PRL=True, is_PRF=True, PRF_top=1, hard_neg_type="bm25",
        max_query_length=12, max_doc_length=12, max_response_length=12,
        max_concat_length=24,
    )
    tok = RobertaTokenizer.from_pretrained(ckpt)
    examples = build_topiocqa_train_examples_expanded(
        dcfg, tok, str(train_file), is_pseudo_prepos=True
    )
    assert len(examples) == 16
    from haconvdr_tpu.models.hf_import import load_hf_checkpoint

    params2, _ = load_hf_checkpoint(str(saved))
    before, _ = load_hf_checkpoint(ckpt)
    diff = np.abs(
        np.asarray(params2["embedding_head"]["kernel"])
        - np.asarray(before["embedding_head"]["kernel"])
    ).max()
    assert diff > 0


def test_cli_prj(hf_checkpoint, tmp_path):
    """Drive cli.test_prj: probe file + probe qrels + embedding store ->
    rel-label JSONL."""
    ckpt, cfg = hf_checkpoint
    # build a small store with the checkpoint encoder (reuses CLI pipelines)
    coll = tmp_path / "coll.tsv"
    with open(coll, "w") as f:
        f.write("id\ttext\ttitle\n")
        for pid in range(1, 9):
            s_ = chr(96 + pid) * 3 + " " + chr(64 + pid) + str(pid)
            f.write(f"{pid}\t{s_}\tt\n")
    from haconvdr_tpu.cli.gen_tokenized_doc import main as tokenize_main
    from haconvdr_tpu.cli.gen_doc_embeddings import main as embed_main

    tok_dir, emb_dir = tmp_path / "tok", tmp_path / "emb"
    tokenize_main([
        f"model.pretrained_encoder_path={ckpt}",
        f"index.raw_collection_path={coll}", f"index.data_output_path={tok_dir}",
        "index.max_seq_length=16", "index.num_tokenize_workers=1",
    ])
    embed_main([
        f"model.pretrained_encoder_path={ckpt}",
        f"index.tokenized_dir={tok_dir}", f"index.data_output_path={emb_dir}",
        "index.per_device_eval_batch_size=1", "index.per_block_passage_num=8",
    ])

    gold_text = "ccc C3"  # passage 3's exact text
    probes = tmp_path / "probes.json"
    with open(probes, "w") as f:
        f.write(json.dumps({"id": "5-2-0", "conv_id": 5, "turn_id": 2,
                            "query": gold_text, "query_pair": "",
                            "pos_docs_id": [3], "last_response": ""}) + "\n")
        f.write(json.dumps({"id": "5-2-1", "conv_id": 5, "turn_id": 2,
                            "query": gold_text, "query_pair": "unrelated stuff",
                            "pos_docs_id": [3], "last_response": ""}) + "\n")
    probe_qrel = tmp_path / "probe_qrel.trec"
    probe_qrel.write_text("5-2-0 Q0 3 1\n5-2-1 Q0 3 1\n")

    from haconvdr_tpu.cli.test_prj import main as prj_main

    out = tmp_path / "rel_label.json"
    prj_main([
        f"model.pretrained_encoder_path={ckpt}",
        f"data.test_file_path={probes}",
        "data.max_query_length=16", "data.max_doc_length=16",
        "data.max_concat_length=48",
        f"search.passage_embeddings_dir_path={emb_dir}",
        f"search.passage_offset2pid_path={tok_dir / 'offset2pid.pickle'}",
        f"search.trec_gold_qrel_file_path={probe_qrel}",
        "search.top_k=5", "search.passage_chunk=8", "search.query_chunk=4",
        "search.per_device_test_batch_size=1",
        f"prj_output={out}",
    ])
    from haconvdr_tpu.utils.io import read_jsonl_list

    recs = {r["id"]: r["rel_label"] for r in read_jsonl_list(str(out))}
    # base probe is the exact gold text (MRR 1.0) -> expansion can't beat it
    assert recs["5-2"] == [0]
    assert recs["5-1"] == []

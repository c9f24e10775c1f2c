"""Data-layer golden tests: sequence primitives and dataset builders."""

import json

import numpy as np
import pytest

from haconvdr_tpu.config import DataConfig
from haconvdr_tpu.data.loader import batch_iter, collate, num_batches
from haconvdr_tpu.data.prj import build_prj_probe_examples
from haconvdr_tpu.data.qrecc import build_qrecc_examples
from haconvdr_tpu.data.sequence import ConcatBuilder, pad_seq_to_length
from haconvdr_tpu.data.topiocqa import (
    build_topiocqa_test_examples,
    build_topiocqa_train_examples,
)
from haconvdr_tpu.utils.testing import FakeTokenizer


def test_pad_seq_to_length():
    ids, mask = pad_seq_to_length([5, 6, 7], 5)
    assert ids == [5, 6, 7, 0, 0]
    assert mask == [1, 1, 1, 0, 0]
    # truncation branch keeps an ALL-ONES mask (src/data.py:13-15 quirk)
    ids, mask = pad_seq_to_length([5, 6, 7, 8], 2)
    assert ids == [5, 6]
    assert mask == [1, 1]


def test_concat_builder_overflow_rule():
    b = ConcatBuilder(6)
    assert b.add([0, 10, 2])  # fits
    ok = b.add([0, 11, 12, 13, 2])  # would make 8 > 6
    assert not ok
    # budget = 6 - 3 - 1 = 2 -> seg[:2] + [seg[-1]]  (forced trailing [SEP])
    assert b.ids == [0, 10, 2, 0, 11, 2]
    assert not b.add([0, 99, 2])  # full: refuses further segments
    assert b.ids == [0, 10, 2, 0, 11, 2]


# ---------------------------------------------------------------------------
# TopiOCQA fixtures
# ---------------------------------------------------------------------------

def _topiocqa_file(tmp_path, records):
    p = tmp_path / "train.json"
    with open(p, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return str(p)


def _mk_record(sample_id, query, last_response="", pos_doc="posdoc", rel_label=(),
               bm25_neg="negdoc", pseudo=(), preposneg=()):
    return {
        "sample_id": sample_id,
        "cur_utt_text": query,
        "last_response": last_response,
        "pos_docs": [pos_doc],
        "pos_docs_pids": [1],
        "rel_label": list(rel_label),
        "bm25_hard_neg_docs": [bm25_neg],
        "pseudo_prepos_docs": list(pseudo),
        "prepos_neg_docs": list(preposneg),
    }


def test_topiocqa_train_builder_prl_expansion(tmp_path):
    tok = FakeTokenizer()
    cfg = DataConfig(
        max_query_length=8, max_doc_length=8, max_response_length=8,
        max_concat_length=32, use_PRL=True, is_train=True,
    )
    records = [
        _mk_record("T_1_1", "who is ada", pos_doc="ada was a countess"),
        _mk_record("T_1_2", "where born", pos_doc="born in london",
                   rel_label=[1], last_response="ada was a countess"),
        _mk_record("T_1_3", "when died", pos_doc="died in 1852",
                   rel_label=[1, 0], last_response="born in london"),
    ]
    path = _topiocqa_file(tmp_path, records)
    ex = build_topiocqa_train_examples(cfg, tok, path)

    # turn 3: rel_label [1,0] -> only turn 1 (index 0) is relevant;
    # conv_qp = cur_utt + pos_doc(turn1) + query(turn1)
    e = ex[2]
    expect = (
        tok.encode("when died")
        + tok.encode("ada was a countess")
        + tok.encode("who is ada")
    )
    got = [t for t, m in zip(e["conv_qp"], e["conv_qp_mask"]) if m]
    assert got == expect

    # turn 1: empty rel_label and empty last_response -> bare query
    got1 = [t for t, m in zip(ex[0]["conv_qp"], ex[0]["conv_qp_mask"]) if m]
    assert got1 == tok.encode("who is ada")

    # turn 2: rel_label [1] -> turn-1 passage + query appended
    got2 = [t for t, m in zip(ex[1]["conv_qp"], ex[1]["conv_qp_mask"]) if m]
    assert got2 == (
        tok.encode("where born")
        + tok.encode("ada was a countess")
        + tok.encode("who is ada")
    )

    # docs tokenized with truncation at max_doc_length
    assert len(ex[2]["pos_docs"]) == cfg.max_doc_length
    pos_valid = [t for t, m in zip(ex[2]["pos_docs"], ex[2]["pos_docs_mask"]) if m]
    assert pos_valid == tok.encode("died in 1852")


def test_topiocqa_train_no_prl_uses_last_response(tmp_path):
    tok = FakeTokenizer()
    cfg = DataConfig(
        max_query_length=8, max_doc_length=8, max_response_length=8,
        max_concat_length=32, use_PRL=False, is_train=True,
    )
    records = [
        _mk_record("T_1_1", "who is ada"),
        _mk_record("T_1_2", "where born", rel_label=[0],
                   last_response="ada was a countess"),
    ]
    ex = build_topiocqa_train_examples(cfg, tok, _topiocqa_file(tmp_path, records))
    got = [t for t, m in zip(ex[1]["conv_qp"], ex[1]["conv_qp_mask"]) if m]
    assert got == tok.encode("where born") + tok.encode("ada was a countess")


def test_topiocqa_train_prepos_flags(tmp_path):
    tok = FakeTokenizer()
    cfg = DataConfig(
        max_query_length=8, max_doc_length=8, max_response_length=8,
        max_concat_length=32, use_PRL=True, is_train=True,
    )
    records = [
        _mk_record("T_1_1", "q one"),
        _mk_record("T_1_2", "q two", rel_label=[1], pseudo=["good hist doc"],
                   preposneg=[]),
        _mk_record("T_1_3", "q three", rel_label=[0, 1], pseudo=["another"],
                   preposneg=["bad hist doc"]),
    ]
    ex = build_topiocqa_train_examples(cfg, tok, _topiocqa_file(tmp_path, records))
    assert ex[0]["has_pseudo_prepos"] == 0 and ex[0]["has_prepos_neg"] == 0
    assert ex[1]["has_pseudo_prepos"] == 1 and ex[1]["has_prepos_neg"] == 0
    assert ex[2]["has_pseudo_prepos"] == 1 and ex[2]["has_prepos_neg"] == 1
    v = [t for t, m in zip(ex[2]["prepos_neg_docs"], ex[2]["prepos_neg_docs_mask"]) if m]
    assert v == tok.encode("bad hist doc")


def test_topiocqa_test_builder_all_history_when_no_prl(tmp_path):
    tok = FakeTokenizer()
    cfg = DataConfig(
        max_query_length=8, max_doc_length=8, max_response_length=8,
        max_concat_length=64, use_PRL=False, is_train=False,
    )
    records = [
        _mk_record("T_1_1", "who is ada", pos_doc="doc one"),
        _mk_record("T_1_2", "where born", pos_doc="doc two", rel_label=[0]),
        _mk_record("T_1_3", "when died", pos_doc="doc three", rel_label=[0, 0]),
    ]
    ex = build_topiocqa_test_examples(cfg, tok, _topiocqa_file(tmp_path, records))
    # convqp at test time = cur query + ALL prior (pos passage, query),
    # newest first, regardless of labels (src/data.py:97-127)
    got = [t for t, m in zip(ex[2]["conv_qp"], ex[2]["conv_qp_mask"]) if m]
    assert got == (
        tok.encode("when died")
        + tok.encode("doc two") + tok.encode("where born")
        + tok.encode("doc one") + tok.encode("who is ada")
    )
    raw = [t for t, m in zip(ex[2]["raw_query"], ex[2]["raw_query_mask"]) if m]
    assert raw == tok.encode("when died")


def test_topiocqa_test_builder_truncation_ends_with_sep(tmp_path):
    tok = FakeTokenizer()
    cfg = DataConfig(
        max_query_length=8, max_doc_length=16, max_response_length=8,
        max_concat_length=12, use_PRL=False, is_train=False,
    )
    long_doc = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    records = [
        _mk_record("T_1_1", "first query", pos_doc=long_doc),
        _mk_record("T_1_2", "second query", rel_label=[0]),
    ]
    ex = build_topiocqa_test_examples(cfg, tok, _topiocqa_file(tmp_path, records))
    ids = ex[1]["conv_qp"]
    assert len(ids) == cfg.max_concat_length
    assert all(ex[1]["conv_qp_mask"])
    # truncated concat must still end with [SEP] (src/data.py:106)
    assert ids[-1] == tok.sep_token_id


# ---------------------------------------------------------------------------
# QReCC
# ---------------------------------------------------------------------------

def _qrecc_record(sample_id, cur, ctx=(), response="ans", pos=("posdoc",),
                  rel_label=(), neg="negdoc", pseudo=(), preposneg=()):
    return {
        "sample_id": sample_id,
        "cur_utt_text": cur,
        "cur_response_text": response,
        "ctx_utts_text": list(ctx),
        "pos_docs_text": list(pos),
        "rel_label": list(rel_label),
        "bm25_hard_neg_docs": [neg],
        "pseudo_prepos_docs": list(pseudo),
        "prepos_neg_docs": list(preposneg),
    }


def test_qrecc_builder_prl_and_skip_empty_pos(tmp_path):
    tok = FakeTokenizer()
    cfg = DataConfig(
        dataset="qrecc", max_query_length=8, max_doc_length=8,
        max_response_length=8, max_concat_length=64, use_PRL=True, is_train=True,
    )
    records = [
        _qrecc_record("Q_1_1", "first q", response="first answer"),
        _qrecc_record("Q_1_2", "no pos", pos=[]),  # skipped (src/data.py:527)
        _qrecc_record("Q_1_3", "third q", rel_label=[1, 0]),
    ]
    p = tmp_path / "qrecc.json"
    with open(p, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    ex = build_qrecc_examples(cfg, tok, str(p))
    assert len(ex) == 2
    # third q: label-1 turn is index 0 -> record i-2 = "first q";
    # conv_qa = cur + answer(turn1) + query(turn1) (src/data.py:546-555)
    got = [t for t, m in zip(ex[1]["conv_qa"], ex[1]["conv_qa_mask"]) if m]
    assert got == (
        tok.encode("third q")
        + tok.encode("first answer")
        + tok.encode("first q")
    )


def test_qrecc_builder_history_walk_without_prl(tmp_path):
    tok = FakeTokenizer()
    cfg = DataConfig(
        dataset="qrecc", max_query_length=8, max_doc_length=8,
        max_response_length=8, max_concat_length=64, use_PRL=False, is_train=False,
    )
    records = [
        _qrecc_record("Q_1_2", "cur q", ctx=["q1", "a1", "q2", "a2"]),
    ]
    p = tmp_path / "qrecc.json"
    with open(p, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    ex = build_qrecc_examples(cfg, tok, str(p))
    got = [t for t, m in zip(ex[0]["conv_qa"], ex[0]["conv_qa_mask"]) if m]
    # newest-first: a2, q2, a1, q1 (src/data.py:557-567)
    assert got == (
        tok.encode("cur q") + tok.encode("a2") + tok.encode("q2")
        + tok.encode("a1") + tok.encode("q1")
    )


# ---------------------------------------------------------------------------
# PRJ probes
# ---------------------------------------------------------------------------

def test_prj_probe_examples(tmp_path):
    tok = FakeTokenizer()
    cfg = DataConfig(max_query_length=8, max_doc_length=8, max_concat_length=32)
    p = tmp_path / "probes.json"
    with open(p, "w") as f:
        f.write(json.dumps({"id": "1-2-0", "conv_id": 1, "turn_id": 2,
                            "query": "cur q", "query_pair": "",
                            "last_response": ""}) + "\n")
        f.write(json.dumps({"id": "1-2-1", "conv_id": 1, "turn_id": 2,
                            "query": "cur q", "query_pair": "hist q",
                            "last_response": ""}) + "\n")
    ex = build_prj_probe_examples(cfg, tok, str(p))
    got0 = [t for t, m in zip(ex[0]["pair_query"], ex[0]["pair_query_mask"]) if m]
    got1 = [t for t, m in zip(ex[1]["pair_query"], ex[1]["pair_query_mask"]) if m]
    assert got0 == tok.encode("cur q")
    assert got1 == tok.encode("cur q") + tok.encode("hist q")


# ---------------------------------------------------------------------------
# Loader
# ---------------------------------------------------------------------------

def test_collate_and_batch_iter():
    examples = [
        {"sample_id": f"s{i}", "x": [i, i + 1], "x_mask": [1, 1]} for i in range(5)
    ]
    batches = list(batch_iter(examples, batch_size=2))
    assert len(batches) == 3 == num_batches(5, 2)
    last = batches[-1]
    # final batch padded to full size with valid mask
    assert last["x"].shape == (2, 2)
    np.testing.assert_array_equal(last["valid"], [1, 0])
    assert last["sample_id"] == ["s4", "s4"]  # pad repeats the batch's first row
    for b in batches:
        assert b["x"].dtype == np.int32


def test_topiocqa_expanded_train_builder(tmp_path):
    from haconvdr_tpu.data.topiocqa import build_topiocqa_train_examples_expanded

    tok = FakeTokenizer()
    cfg = DataConfig(
        max_query_length=8, max_doc_length=8, max_response_length=8,
        max_concat_length=32, use_PRL=True, is_train=True, hard_neg_type="bm25",
    )
    records = [
        _mk_record("T_1_1", "q one", pos_doc="gold one", bm25_neg="neg one"),
        _mk_record("T_1_2", "q two", rel_label=[1], pos_doc="gold two",
                   bm25_neg="neg two", pseudo=["hist pos a", "hist pos b"]),
    ]
    ex = build_topiocqa_train_examples_expanded(
        cfg, tok, _topiocqa_file(tmp_path, records)
    )
    # turn 1: one gold example; turn 2: 2 pseudo examples + 1 gold example
    assert len(ex) == 4
    pos2 = [t for t, m in zip(ex[1]["pos_docs"], ex[1]["pos_docs_mask"]) if m]
    assert pos2 == tok.encode("hist pos a")
    gold2 = [t for t, m in zip(ex[3]["pos_docs"], ex[3]["pos_docs_mask"]) if m]
    assert gold2 == tok.encode("gold two")
    neg2 = [t for t, m in zip(ex[3]["neg_docs"], ex[3]["neg_docs_mask"]) if m]
    assert neg2 == tok.encode("neg two")  # first bm25 neg for the gold example


def test_qrecc_multineg_builder(tmp_path):
    from haconvdr_tpu.data.qrecc import build_qrecc_multineg_examples

    tok = FakeTokenizer()
    cfg = DataConfig(
        dataset="qrecc", max_query_length=8, max_doc_length=8,
        max_response_length=8, max_concat_length=32, use_PRL=False, is_train=True,
    )
    rec = {
        "sample_id": "Q_1_1", "cur_utt_text": "q one", "cur_response_text": "a",
        "ctx_utts_text": [], "pos_docs_text": ["pos doc"],
        "rel_label": [], "bm25_hard_neg_docs": ["n1", "n2", "n3", "n4"],
    }
    p = tmp_path / "f.json"
    p.write_text(json.dumps(rec) + "\n")
    ex = build_qrecc_multineg_examples(cfg, tok, str(p), num_negs=3)
    assert ex[0]["num_negs"] == 3
    assert np.asarray(ex[0]["neg_docs"]).shape == (3, cfg.max_doc_length)
    n0 = [t for t, m in zip(ex[0]["neg_docs"][0], ex[0]["neg_docs_mask"][0]) if m]
    assert n0 == tok.encode("n1")

"""L0 preprocessing pipeline tests on synthetic raw dumps."""

import json

import pytest

from haconvdr_tpu.preprocess import qrecc as pq
from haconvdr_tpu.preprocess import topiocqa as pt
from haconvdr_tpu.preprocess.collections import convert_collection_to_jsonl
from haconvdr_tpu.utils.io import pstore, read_jsonl_list


def _gold(conv_id, turn_id, question, pid, title="T [SEP] S", text="body"):
    return {
        "conv_id": conv_id,
        "turn_id": turn_id,
        "question": question,
        "answers": ["ans"],
        "positive_ctxs": [{"passage_id": str(pid), "title": title, "text": text}],
    }


@pytest.fixture()
def topiocqa_files(tmp_path):
    train = [
        _gold(1, 1, "q11", 10),
        _gold(1, 2, "q12", 20),
        _gold(2, 1, "q21", 30),
    ]
    dev = [_gold(5, 1, "d11", 40), _gold(5, 2, "d12", 50)]
    raw_train = tmp_path / "gold_train.json"
    raw_dev = tmp_path / "gold_dev.json"
    raw_train.write_text(json.dumps(train))
    raw_dev.write_text(json.dumps(dev))
    qid2passage = {i: f"passage {i}" for i in range(100)}
    return raw_train, raw_dev, qid2passage, tmp_path


def test_gen_train_test_files(topiocqa_files):
    raw_train, raw_dev, qid2passage, tmp = topiocqa_files
    out_train, out_test = tmp / "train.json", tmp / "test.json"
    pt.gen_train_test_files(
        str(raw_train), str(raw_dev), str(out_train), str(out_test),
        qid2passage=qid2passage, num_passages=100,
    )
    recs = read_jsonl_list(str(out_train))
    assert [r["sample_id"] for r in recs] == [
        "TopiOCQA-Train_1_1", "TopiOCQA-Train_1_2", "TopiOCQA-Train_2_1",
    ]
    # conv reset: turn 2_1 must have empty last_response and prepos pool
    assert recs[2]["last_response"] == ""
    assert recs[2]["prepos_neg_docs_pids"] == []
    # turn 1_2: last_response = turn 1_1's positive; prepos pool = {10}
    assert recs[1]["last_response"] == "T S body"
    assert recs[1]["prepos_neg_docs_pids"] == [10]
    assert recs[1]["neg_docs_pids"] == [10]
    assert recs[1]["neg_docs"] == ["passage 10"]


def test_gen_topiocqa_qrel(topiocqa_files, tmp_path):
    _, raw_dev, _, _ = topiocqa_files
    out = tmp_path / "qrel.trec"
    pt.gen_topiocqa_qrel(str(raw_dev), str(out))
    lines = out.read_text().splitlines()
    assert lines == ["TopiOCQA-Dev_5_1 0 40 1", "TopiOCQA-Dev_5_2 0 50 1"]


def test_rel_label_and_bm25_merges(topiocqa_files, tmp_path):
    raw_train, raw_dev, qid2passage, tmp = topiocqa_files
    out_train, out_test = tmp / "train.json", tmp / "test.json"
    pt.gen_train_test_files(
        str(raw_train), str(raw_dev), str(out_train), str(out_test),
        qid2passage=qid2passage, num_passages=100,
    )
    rel_file = tmp / "rel.json"
    with open(rel_file, "w") as f:
        f.write(json.dumps({"id": "1-1", "rel_label": []}) + "\n")
        f.write(json.dumps({"id": "1-2", "rel_label": [1]}) + "\n")
        f.write(json.dumps({"id": "2-1", "rel_label": []}) + "\n")
    merged = tmp / "train_rel.json"
    pt.merge_rel_label_info(str(rel_file), str(out_train), str(merged))
    recs = read_jsonl_list(str(merged))
    assert recs[0]["rel_label"] == []
    assert recs[1]["rel_label"] == [1]

    run_file = tmp / "bm25.trec"
    with open(run_file, "w") as f:
        # includes the gold positive (20) which must be filtered out
        for rank, pid in enumerate([20, 7, 8]):
            f.write(f"TopiOCQA-Train_1_2 Q0 {pid} {rank+1} {199-rank} 9.9 bm25\n")
        f.write("TopiOCQA-Train_1_1 Q0 3 1 199 5.0 bm25\n")
        f.write("TopiOCQA-Train_2_1 Q0 4 1 199 5.0 bm25\n")
    with_negs = tmp / "train_negs.json"
    pt.merge_bm25_neg_info(str(run_file), str(merged), str(with_negs))
    recs = read_jsonl_list(str(with_negs))
    assert recs[1]["bm25_hard_neg_docs_pids"] == [7, 8]

    pt.extract_doc_content_of_bm25_hard_negs_for_train_file(
        "", str(with_negs), str(with_negs), qid2passage=qid2passage
    )
    recs = read_jsonl_list(str(with_negs))
    assert recs[1]["bm25_hard_neg_docs"] == ["passage 7", "passage 8"]

    final = tmp / "train_with_info.json"
    pt.reformulate_dataset_info(str(with_negs), str(final))
    recs = read_jsonl_list(str(final))
    # turn 1-2 label [1]: history turn 1 (record 0) positives are pseudo-pos
    assert recs[1]["pseudo_prepos_docs_pids"] == [10]
    assert recs[1]["prepos_neg_docs_pids"] == []
    assert recs[1]["rel_label"] == [1]


def test_prf_selection(tmp_path):
    bm25_file = tmp_path / "bm25.trec"
    ance_file = tmp_path / "ance.trec"
    with open(bm25_file, "w") as f, open(ance_file, "w") as g:
        for rank in range(1, 101):
            f.write(f"q1 Q0 {1000+rank} {rank} {200-rank} 1.0 bm25\n")
            g.write(f"q1 Q0 {2000+rank} {rank} {200-rank} 1.0 ance\n")
    pos, neg = pt.select_pseudo_relevant_feedback_passage(str(bm25_file), str(ance_file))
    # disjoint runs: positives = dense top-3
    assert pos["q1"] == [2001, 2002, 2003]
    assert len(neg["q1"]) == 3


def test_combine_topiocqa_data(tmp_path):
    raw = [
        {"Question": "q1", "Answer": "a1", "Context": [], "Topic": "T",
         "Topic_section": "S", "Rationale": "", "is_nq": False},
        {"Question": "q2", "Answer": "a2", "Context": ["q1", "a1"], "Topic": "T",
         "Topic_section": "S", "Rationale": "", "is_nq": False},
    ]
    gold = [
        {"conv_id": 1, "turn_id": 1,
         "positive_ctxs": [{"passage_id": "5", "title": "Ti [SEP] Sec", "text": "tx1"}]},
        {"conv_id": 1, "turn_id": 2,
         "positive_ctxs": [{"passage_id": "6", "title": "Ti", "text": "tx2"}]},
    ]
    rw = [{"question": "r1"}, {"question": "r2"}]
    for name, obj in (("raw.json", raw), ("gold.json", gold), ("rw.json", rw)):
        (tmp_path / name).write_text(json.dumps(obj))
    out = tmp_path / "combined.json"
    pt.combine_topiocqa_data(
        str(tmp_path / "raw.json"), str(tmp_path / "gold.json"),
        str(tmp_path / "rw.json"), str(out),
    )
    recs = read_jsonl_list(str(out))
    assert recs[0]["last_response"] == ""
    assert recs[1]["last_response"] == "Ti Sec tx1"
    assert recs[1]["history_query"] == ["q1"]
    assert recs[1]["history_answer"] == ["a1"]
    assert recs[1]["history_rewrite"] == ["r1"]
    assert recs[1]["pos_docs_id"] == [6]


# ---------------------------------------------------------------------------
# QReCC
# ---------------------------------------------------------------------------

def _qrecc_turn(conv, turn, question, rewrite, answer, passages, context):
    return {
        "Conversation_no": conv, "Turn_no": turn, "Question": question,
        "Truth_rewrite": rewrite, "Truth_answer": answer,
        "Truth_passages": passages, "Context": context,
        "Conversation_source": "quac",
    }


@pytest.fixture()
def qrecc_files(tmp_path):
    pid2rawpid = ["r0", "r1", "r2", "r3"]
    pstore(pid2rawpid, str(tmp_path / "pid2rawpid.pkl"))
    train = [
        _qrecc_turn(1, 1, "q1", "rw1", "ans1", ["r0"], []),
        _qrecc_turn(1, 2, "q2", "rw2", "ans2", ["r1"], ["q1", "ans1"]),
    ]
    test = [_qrecc_turn(9, 1, "tq1", "trw1", "tans1", ["r2"], [])]
    (tmp_path / "train_raw.json").write_text(json.dumps(train))
    (tmp_path / "test_raw.json").write_text(json.dumps(test))
    return tmp_path


def test_gen_qrecc_train_test_and_qrel(qrecc_files):
    tmp = qrecc_files
    pq.gen_qrecc_train_test_files(
        str(tmp / "train_raw.json"), str(tmp / "test_raw.json"),
        str(tmp / "train.json"), str(tmp / "test.json"),
        str(tmp / "pid2rawpid.pkl"), num_passages=4,
    )
    recs = read_jsonl_list(str(tmp / "train.json"))
    # first turn query replaced by rewrite (CONQRR)
    assert recs[0]["cur_utt_text"] == "rw1"
    # ctx queries use substituted utterances
    assert recs[1]["ctx_utts_text"] == ["rw1", "ans1"]
    assert recs[1]["pos_docs_pids"] == [1]
    assert recs[1]["prepos_neg_docs_pids"] == [0]
    assert len(recs[0]["random_neg_docs_pids"]) == 3  # only 3 non-pos pids exist

    pq.gen_qrecc_qrel(
        str(tmp / "test_raw.json"), str(tmp / "qrel.tsv"), str(tmp / "pid2rawpid.pkl")
    )
    assert (tmp / "qrel.tsv").read_text().splitlines() == ["QReCC-Test_9_1\t0\t2\t1"]


def test_qrecc_doc_extraction_and_reformulate(qrecc_files):
    tmp = qrecc_files
    pq.gen_qrecc_train_test_files(
        str(tmp / "train_raw.json"), str(tmp / "test_raw.json"),
        str(tmp / "train.json"), str(tmp / "test.json"),
        str(tmp / "pid2rawpid.pkl"), num_passages=4,
    )
    pid2doc = {i: f"doc {i}" for i in range(4)}
    pq.extract_doc_content_of_random_negs_for_train_file(
        "", str(tmp / "train.json"), str(tmp / "train_doc.json"), pid2doc=pid2doc
    )
    recs = read_jsonl_list(str(tmp / "train_doc.json"))
    assert recs[1]["pos_docs_text"] == ["doc 1"]

    rel = tmp / "rel.json"
    with open(rel, "w") as f:
        f.write(json.dumps({"id": "1-2", "rel_label": [1]}) + "\n")
    pq.merge_rel_label_info(str(rel), str(tmp / "train_doc.json"), str(tmp / "train_rel.json"))
    recs = read_jsonl_list(str(tmp / "train_rel.json"))
    assert recs[0]["rel_label"] == []
    assert recs[1]["rel_label"] == [1]

    run = tmp / "bm25.trec"
    with open(run, "w") as f:
        f.write("QReCC-Train_1_2 Q0 3 1 199 3.3 bm25\n")
        f.write("QReCC-Train_1_1 Q0 2 1 199 3.3 bm25\n")
    pq.merge_bm25_neg_info(str(run), str(tmp / "train_rel.json"), str(tmp / "train_negs.json"))
    pq.extract_doc_content_of_bm25_hard_negs_for_train_file(
        "", str(tmp / "train_negs.json"), str(tmp / "train_negs.json"),
        neg_ratio=1, pid2doc=pid2doc,
    )
    recs = read_jsonl_list(str(tmp / "train_negs.json"))
    assert recs[1]["bm25_hard_neg_docs"] == ["doc 3"]

    pq.reformulate_dataset_info(str(tmp / "train_negs.json"), str(tmp / "final.json"))
    recs = read_jsonl_list(str(tmp / "final.json"))
    assert recs[1]["pseudo_prepos_docs"] == ["doc 0"]
    assert recs[1]["prepos_neg_docs"] == []


def test_convert_collection_to_jsonl(tmp_path):
    tsv = tmp_path / "coll.tsv"
    tsv.write_text("id\ttext\ttitle\n1\tbody one\tTi [SEP] Sec\n")
    out = tmp_path / "out.jsonl"
    convert_collection_to_jsonl(str(tsv), str(out))
    rec = json.loads(out.read_text().splitlines()[0])
    assert rec == {"contents": "Ti Sec body one", "id": "doc1"}


def test_iter_jsonl_collection(tmp_path):
    from haconvdr_tpu.preprocess.collections import iter_jsonl_collection

    p = tmp_path / "coll.jsonl"
    p.write_text('{"id": "7", "title": "Ti", "text": "body"}\n')
    assert list(iter_jsonl_collection(str(p))) == [(7, "Ti[SEP]body")]

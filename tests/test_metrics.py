"""Metric semantics tests: hand-computed pytrec_eval-equivalent values."""

import math

import numpy as np

from haconvdr_tpu.eval.metrics import evaluate_run, trec_metrics
from haconvdr_tpu.eval.trec import read_qrels, read_run, write_run, print_trec_res


def test_recip_rank_and_recall():
    run = {"q1": {"d1": 3.0, "d2": 2.0, "d3": 1.0}}
    qrels = {"q1": {"d2": 1, "d3": 1}}
    per_q = evaluate_run(run, qrels, qrels)
    m = per_q["q1"]
    assert m["recip_rank"] == 0.5  # first relevant at rank 2
    assert m["recall_5"] == 1.0
    # recall@1 not computed by default; map = (1/2 + 2/3)/2
    assert abs(m["map"] - (0.5 + 2 / 3) / 2) < 1e-12


def test_ndcg_cut3_graded():
    # graded rels: d1=2, d2=1; ranking d2, d1, d3
    run = {"q": {"d2": 9.0, "d1": 8.0, "d3": 7.0}}
    graded = {"q": {"d1": 2, "d2": 1}}
    binary = {"q": {"d1": 1, "d2": 1}}
    per_q = evaluate_run(run, binary, graded)
    dcg = 1 / math.log2(2) + 2 / math.log2(3)
    idcg = 2 / math.log2(2) + 1 / math.log2(3)
    assert abs(per_q["q"]["ndcg_cut_3"] - dcg / idcg) < 1e-12


def test_tie_break_docid_desc():
    # trec_eval ranks equal scores by docid DESCENDING
    run = {"q": {"a": 1.0, "b": 1.0}}
    qrels = {"q": {"b": 1}}
    per_q = evaluate_run(run, qrels, qrels)
    assert per_q["q"]["recip_rank"] == 1.0  # "b" > "a" lexicographically


def test_queries_restricted_to_qrels():
    run = {"q1": {"d": 1.0}, "q_unknown": {"d": 1.0}}
    qrels = {"q1": {"d": 1}}
    res, per_q = trec_metrics(run, qrels, qrels)
    assert set(per_q) == {"q1"}
    assert res["MRR"] == 100.0


def test_run_file_roundtrip(tmp_path):
    ranked = {"q1": [(5, 9.5), (7, 8.25)], "q2": [(3, 7.0), (5, 6.0)]}
    run_file = str(tmp_path / "run.trec")
    write_run(ranked, run_file)
    lines = open(run_file).read().splitlines()
    # reference layout: qid Q0 pid rank (200-rank) score tag
    assert lines[0] == "q1 Q0 5 1 199 9.5 ance"
    runs = read_run(run_file)
    # evaluation score column is (200-rank), as in the reference
    assert runs["q1"]["5"] == 199.0
    assert runs["q1"]["7"] == 198.0


def test_print_trec_res_end_to_end(tmp_path):
    run_file = str(tmp_path / "run.trec")
    qrel_file = str(tmp_path / "qrel.trec")
    write_run({"q1": [(5, 9.0), (7, 8.0)], "q2": [(1, 3.0), (2, 2.0)]}, run_file)
    with open(qrel_file, "w") as f:
        f.write("q1 0 7 1\n")  # q1: relevant doc at rank 2
        f.write("q2 0 1 2\n")  # q2: graded rel 2 at rank 1
        f.write("q2 0 9 1\n")  # unretrieved relevant doc
    res = print_trec_res(run_file, qrel_file, rel_threshold=1)
    # MRR: (0.5 + 1.0)/2
    assert res["MRR"] == 75.0
    # Recall@10: q1 -> 1/1, q2 -> 1/2
    assert res["Recall@10"] == 75.0
    # NDCG@3: q1: (1/log2(3)) / 1; q2 graded: (2/log2(2)) / (2/log2(2)+1/log2(3))
    ndcg_q1 = (1 / math.log2(3)) / (1 / math.log2(2))
    ndcg_q2 = (2 / math.log2(2)) / (2 / math.log2(2) + 1 / math.log2(3))
    assert abs(res["NDCG@3"] - round((ndcg_q1 + ndcg_q2) / 2 * 100, 5)) < 1e-6


def test_rel_threshold_binarization(tmp_path):
    qrel_file = str(tmp_path / "qrel.trec")
    with open(qrel_file, "w") as f:
        f.write("q1 0 d1 2\n")
        f.write("q1 0 d2 1\n")
        f.write("q1 0 d3 0\n")
    binary, graded = read_qrels(qrel_file, rel_threshold=2)
    assert binary["q1"] == {"d1": 1, "d2": 0, "d3": 0}
    assert graded["q1"] == {"d1": 2, "d2": 1, "d3": 0}


def test_print_res_json_variant():
    from haconvdr_tpu.eval.analysis import print_res

    gold = [
        {"conv_id": 1, "turn_id": 1, "positive_ctxs": [{"passage_id": "5"}]},
        {"conv_id": 1, "turn_id": 2, "positive_ctxs": [{"passage_id": "9"}]},
    ]
    result = [
        {"conv_id": 1, "turn_id": 1,
         "ctxs": [{"doc_id": "3"}, {"doc_id": "5"}]},   # gold at rank 2
        {"conv_id": 1, "turn_id": 2,
         "ctxs": [{"doc_id": "1"}, {"doc_id": "2"}]},   # gold missing -> 1000
    ]
    res = print_res(result, gold)
    assert res["MRR"] == 25.0            # (0.5 + 0)/2
    assert res["R@1"] == 0.0
    assert res["R@3"] == 50.0
    import math
    assert abs(res["NDCG"] - round(100 / math.log2(3) / 2, 2)) < 1e-9


def test_metric_by_turn():
    from haconvdr_tpu.eval.analysis import metric_by_turn

    per_q = {
        "Tag_1_1": 1.0, "Tag_2_1": 0.0,     # turn 1 avg 0.5
        "Tag_1_2": 0.4, "7-2": 0.6,         # turn 2 avg 0.5
        "Tag_1_3": 0.9,
    }
    by_turn = metric_by_turn(per_q)
    assert by_turn[1] == 0.5
    assert by_turn[2] == 0.5
    assert by_turn[3] == 0.9

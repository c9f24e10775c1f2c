"""Randomized differential test for the TopiOCQA training concat.

SURVEY.md SS7 calls the truncation/concat quirks hard part (c): they
"silently define what the model sees".  This test re-derives the expected
conv_qp sequence with an independent, deliberately naive simulation of the
reference algorithm (src/data.py:279-319) and compares against the
production builder over many randomized conversations: PRL gating,
last_response fallback, newest-first Q/A history with parity length caps,
and the forced-[SEP] overflow rule.
"""

import json
import random

from haconvdr_tpu.config import DataConfig
from haconvdr_tpu.data.topiocqa import build_topiocqa_train_examples
from haconvdr_tpu.utils.testing import FakeTokenizer


def _naive_expected(records, i, tok, cfg):
    """Step-by-step re-derivation of Retrieval_topiocqa_new's conv_qp."""
    rec = records[i]
    parts = rec["cur_utt_text"].strip().split(" [SEP] ")
    ctx, cur = parts[:-1], parts[-1]
    rel = rec["rel_label"]

    def enc(text, max_len, trunc):
        ids = [tok.cls_token_id] + [tok._id(w) for w in text.split()] + [tok.sep_token_id]
        if trunc and len(ids) > max_len:
            ids = ids[: max_len - 1] + [tok.sep_token_id]
        return ids

    out = list(enc(cur, cfg.max_query_length, False))
    done = False

    def append(seg):
        nonlocal out, done
        if done:
            return
        if len(out) + len(seg) > cfg.max_concat_length:
            out = out + seg[: cfg.max_concat_length - len(out) - 1] + [seg[-1]]
            done = True
        else:
            out = out + seg

    if cfg.use_PRL and 1 in rel:
        for idx in range(len(rel) - 1, -1, -1):
            if rel[idx] != 1 or done:
                continue
            src = records[i - (len(rel) - idx)]
            append(enc(src["pos_docs"][0], cfg.max_doc_length, False))
            append(
                enc(src["cur_utt_text"].strip().split(" [SEP] ")[-1],
                    cfg.max_query_length, False)
            )
    else:
        if len(rec["last_response"]) > 0:
            append(enc(rec["last_response"], cfg.max_doc_length, False))

    for j in range(len(ctx) - 1, -1, -1):
        if done:
            break
        ml = cfg.max_response_length if j % 2 == 1 else cfg.max_query_length
        append(enc(ctx[j], ml, True))

    return out[: cfg.max_concat_length]


def test_randomized_concat_parity(tmp_path):
    rng = random.Random(123)
    words = [f"w{i}" for i in range(60)]

    def sent(lo, hi):
        return " ".join(rng.choice(words) for _ in range(rng.randint(lo, hi)))

    for trial in range(30):
        cfg = DataConfig(
            max_query_length=rng.choice([6, 10]),
            max_doc_length=rng.choice([8, 14]),
            max_response_length=rng.choice([6, 9]),
            max_concat_length=rng.choice([24, 40, 64]),
            use_PRL=rng.random() < 0.7,
            is_train=True,
        )
        n_turns = rng.randint(1, 6)
        records = []
        for t in range(n_turns):
            hist_parts = []
            for _ in range(rng.randint(0, 2) * 2):  # even-length QA history
                hist_parts.append(sent(1, 6))
            cur = sent(1, 12)
            cur_utt = " [SEP] ".join(hist_parts + [cur])
            records.append(
                {
                    "sample_id": f"T_1_{t + 1}",
                    "cur_utt_text": cur_utt,
                    "last_response": sent(0, 10) if t > 0 else "",
                    "pos_docs": [sent(2, 18)],
                    "pos_docs_pids": [t],
                    "rel_label": [rng.randint(0, 1) for _ in range(t)],
                    "bm25_hard_neg_docs": [sent(2, 10)],
                    "pseudo_prepos_docs": [],
                    "prepos_neg_docs": [],
                }
            )
        path = tmp_path / f"trial{trial}.json"
        with open(path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

        tok = FakeTokenizer()
        examples = build_topiocqa_train_examples(cfg, tok, str(path))
        tok2 = FakeTokenizer()
        tok2._vocab = dict(tok._vocab)  # same vocab ids for the oracle
        for i, ex in enumerate(examples):
            got = [t for t, m in zip(ex["conv_qp"], ex["conv_qp_mask"]) if m]
            expect = _naive_expected(records, i, tok2, cfg)
            assert got == expect, (trial, i, cfg, got, expect)
